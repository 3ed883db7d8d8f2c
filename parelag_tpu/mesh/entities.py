"""Mesh entity derivation: global edges/faces with orientation, oriented
boundary operators B0 (element x facet), B1 (facet x ridge), B2 (ridge x peak).

TPU-native replacement for the reference's use of MFEM FE-space incidence
assembly to obtain oriented topology tables (reference:
src/topology/Topology.cpp:100-141 builds B_[i] from Divergence/Curl/Gradient
interpolators followed by OrientationTransform). Here the same +-1 tables come
straight from combinatorial orientation conventions:

  * global edge direction: tail = min(vertex id) -> head = max(vertex id);
    boundary map rows: B2[edge, head] = +1, B2[edge, tail] = -1.
  * global face orientation: the outward cycle of the FIRST element that
    creates the face (so B0[creator, face] = +1, B0[neighbor, face] = -1);
    B1[face, edge] = +1 iff the stored cycle traverses the edge tail->head.

These satisfy B0 @ B1 == 0 and B1 @ B2 == 0 exactly (chain complex).
"""

from dataclasses import dataclass
import numpy as np
import scipy.sparse as sp


@dataclass
class MeshEntities:
    """All derived entity arrays of a 3D mesh."""

    num_vertices: int
    edges: np.ndarray          # (nedge, 2) global (tail, head), tail < head
    face_verts: list           # per face: stored oriented cycle (len 3 or 4)
    face_key_index: dict       # sorted-tuple -> face id
    elem_edge: np.ndarray      # (ne, n_loc_edge) edge ids
    elem_edge_sign: np.ndarray # (ne, n_loc_edge) +-1
    elem_face: np.ndarray      # (ne, n_loc_face) face ids
    elem_face_sign: np.ndarray # (ne, n_loc_face) +-1
    face_edge: np.ndarray      # (nface, max_fe) edge ids (fixed arity per kind)
    face_edge_sign: np.ndarray
    B0: sp.csr_matrix          # element x face, +-1
    B1: sp.csr_matrix          # face x edge, +-1
    B2: sp.csr_matrix          # edge x vertex, +-1

    @property
    def num_edges(self):
        return self.edges.shape[0]

    @property
    def num_faces(self):
        return len(self.face_verts)


def derive_entities(mesh) -> MeshEntities:
    elems = mesh.elements
    ne = elems.shape[0]
    loc_edges = mesh.local_edges
    loc_faces = mesh.local_faces
    n_le = loc_edges.shape[0]
    n_lf = loc_faces.shape[0]

    # ----- edges: unique sorted vertex pairs -------------------------- #
    ev = elems[:, loc_edges]                    # (ne, n_le, 2) local dir
    ev_sorted = np.sort(ev, axis=2)
    flat = ev_sorted.reshape(-1, 2)
    edges, inv = np.unique(flat, axis=0, return_inverse=True)
    elem_edge = inv.reshape(ne, n_le)
    elem_edge_sign = np.where(ev[:, :, 0] < ev[:, :, 1], 1.0, -1.0)

    # ----- faces: unique sorted tuples, creator-oriented cycles ------- #
    fv = elems[:, loc_faces]                    # (ne, n_lf, k)
    fv_sorted = np.sort(fv, axis=2)
    k = fv.shape[2]
    flatf = fv_sorted.reshape(-1, k)
    uniq, first_idx, invf = np.unique(
        flatf, axis=0, return_index=True, return_inverse=True)
    nface = uniq.shape[0]
    elem_face = invf.reshape(ne, n_lf)
    # stored cycle = local cycle of the first (creator) occurrence
    flat_cycles = fv.reshape(-1, k)
    face_verts = [tuple(flat_cycles[first_idx[f]]) for f in range(nface)]
    # sign: +1 if this element's outward cycle matches the stored cycle's
    # orientation, -1 if reversed.
    elem_face_sign = np.zeros((ne, n_lf))
    counts = np.zeros(nface, dtype=np.int64)
    for e in range(ne):
        for lf in range(n_lf):
            f = elem_face[e, lf]
            elem_face_sign[e, lf] = _cycle_sign(
                tuple(fv[e, lf]), face_verts[f])
            counts[f] += 1
    assert counts.max() <= 2, "non-manifold mesh"

    face_key_index = {tuple(uniq[f]): f for f in range(nface)}

    # ----- face_edge with traversal signs ------------------------------ #
    edge_index = {}
    for i, (a, b) in enumerate(edges):
        edge_index[(int(a), int(b))] = i
    face_edge = np.zeros((nface, k), dtype=np.int64)
    face_edge_sign = np.zeros((nface, k))
    for f, cyc in enumerate(face_verts):
        for i in range(k):
            a, b = int(cyc[i]), int(cyc[(i + 1) % k])
            face_edge[f, i] = edge_index[(min(a, b), max(a, b))]
            face_edge_sign[f, i] = 1.0 if a < b else -1.0

    # ----- boundary operators ------------------------------------------ #
    B0 = sp.csr_matrix(
        (elem_face_sign.ravel(),
         (np.repeat(np.arange(ne), n_lf), elem_face.ravel())),
        shape=(ne, nface))
    B1 = sp.csr_matrix(
        (face_edge_sign.ravel(),
         (np.repeat(np.arange(nface), k), face_edge.ravel())),
        shape=(nface, edges.shape[0]))
    nedge = edges.shape[0]
    B2 = sp.csr_matrix(
        (np.concatenate([np.ones(nedge), -np.ones(nedge)]),
         (np.concatenate([np.arange(nedge), np.arange(nedge)]),
          np.concatenate([edges[:, 1], edges[:, 0]]))),
        shape=(nedge, mesh.num_vertices))

    return MeshEntities(
        num_vertices=mesh.num_vertices,
        edges=edges,
        face_verts=face_verts,
        face_key_index=face_key_index,
        elem_edge=elem_edge,
        elem_edge_sign=elem_edge_sign,
        elem_face=elem_face,
        elem_face_sign=elem_face_sign,
        face_edge=face_edge,
        face_edge_sign=face_edge_sign,
        B0=B0, B1=B1, B2=B2,
    )


def _cycle_sign(cycle_a, cycle_b):
    """+1 if cycle_a is a rotation of cycle_b, -1 if a rotation of its
    reversal."""
    k = len(cycle_a)
    start = cycle_b.index(cycle_a[0]) if isinstance(cycle_b, tuple) else 0
    # rotate b so it starts at a[0]
    b = tuple(cycle_b)
    i0 = b.index(cycle_a[0])
    rot = b[i0:] + b[:i0]
    if tuple(cycle_a) == rot:
        return 1.0
    rev = (rot[0],) + tuple(reversed(rot[1:]))
    if tuple(cycle_a) == rev:
        return -1.0
    raise ValueError("faces share vertices but not as a cycle")


def bdr_face_ids(mesh, ents: MeshEntities):
    """Map each mesh boundary face to its global face id."""
    out = np.empty(mesh.bdr_faces.shape[0], dtype=np.int64)
    for i, quad in enumerate(mesh.bdr_faces):
        out[i] = ents.face_key_index[tuple(np.sort(quad))]
    return out


@dataclass
class MeshEntities2D:
    """Entity arrays of a 2D (quad) mesh: facets are edges, ridges are
    vertices (reference 2D topology, Topology.cpp nCodim_=2 path)."""

    num_vertices: int
    edges: np.ndarray            # (nedge, 2) (tail, head), tail < head
    elem_edge: np.ndarray        # (ne, 4)
    elem_edge_sign: np.ndarray   # (ne, 4): ccw traversal vs global direction
    B0: sp.csr_matrix            # element x edge (+-1)
    B1: sp.csr_matrix            # edge x vertex (+-1, head/tail)

    @property
    def num_edges(self):
        return self.edges.shape[0]


def derive_entities_2d(mesh) -> MeshEntities2D:
    elems = mesh.elements
    ne = elems.shape[0]
    loc = mesh.local_edges                     # ccw boundary cycle
    ev = elems[:, loc]                         # (ne, 4, 2)
    ev_sorted = np.sort(ev, axis=2)
    edges, inv = np.unique(ev_sorted.reshape(-1, 2), axis=0,
                           return_inverse=True)
    elem_edge = inv.reshape(ne, 4)
    sign = np.where(ev[:, :, 0] < ev[:, :, 1], 1.0, -1.0)

    B0 = sp.csr_matrix(
        (sign.ravel(),
         (np.repeat(np.arange(ne), 4), elem_edge.ravel())),
        shape=(ne, edges.shape[0]))
    nedge = edges.shape[0]
    B1 = sp.csr_matrix(
        (np.concatenate([np.ones(nedge), -np.ones(nedge)]),
         (np.concatenate([np.arange(nedge), np.arange(nedge)]),
          np.concatenate([edges[:, 1], edges[:, 0]]))),
        shape=(nedge, mesh.num_vertices))
    return MeshEntities2D(
        num_vertices=mesh.num_vertices, edges=edges,
        elem_edge=elem_edge, elem_edge_sign=sign, B0=B0, B1=B1)


def bdr_edge_ids(mesh, ents: MeshEntities2D):
    """Map each 2D mesh boundary segment to its global edge id."""
    index = {(int(a), int(b)): i for i, (a, b) in enumerate(ents.edges)}
    out = np.empty(mesh.bdr_faces.shape[0], dtype=np.int64)
    for i, (a, b) in enumerate(mesh.bdr_faces):
        out[i] = index[(min(int(a), int(b)), max(int(a), int(b)))]
    return out
