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


def unique_rows(a):
    """Value-lexicographic row unique via lexsort (np.unique(axis=0) sorts
    by little-endian bytes and is much slower). Returns (uniq, first_idx,
    inverse) with first_idx the index of each unique row's FIRST occurrence
    in the original order (creator semantics)."""
    a = np.asarray(a)
    order = np.lexsort(a.T[::-1])
    srt = a[order]
    new = np.ones(a.shape[0], dtype=bool)
    if a.shape[0] > 1:
        new[1:] = (srt[1:] != srt[:-1]).any(axis=1)
    gid = np.cumsum(new) - 1
    inv = np.empty(a.shape[0], dtype=np.int64)
    inv[order] = gid
    # first occurrence in ORIGINAL order per group
    n_u = int(gid[-1]) + 1 if a.shape[0] else 0
    first = np.full(n_u, a.shape[0], dtype=np.int64)
    np.minimum.at(first, inv, np.arange(a.shape[0], dtype=np.int64))
    return a[first], first, inv


@dataclass
class MeshEntities:
    """All derived entity arrays of a 3D mesh."""

    num_vertices: int
    edges: np.ndarray          # (nedge, 2) global (tail, head), tail < head
    face_verts: np.ndarray     # (nface, k) stored oriented cycles
    face_sorted: np.ndarray    # (nface, k) sorted vertex keys, row f = face f
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
    nv = mesh.num_vertices

    from parelag_tpu.ops import native
    if native.available() and nv < (1 << 31):
        # single-pass C++ derivation (identical ordering/sign semantics;
        # the numpy pipeline below was the fine-topology hot spot at
        # ~10^7 entity instances)
        edges, elem_edge, elem_edge_sign = native.derive_edges(
            elems, loc_edges, nv)
        face_verts, face_sorted, elem_face, elem_face_sign = \
            native.derive_faces(elems, loc_faces, nv)
        face_edge, face_edge_sign = native.face_edges(face_verts, edges, nv)
        nface, k = face_verts.shape
        B0, B1, B2 = _boundary_operators(
            ne, nface, edges, elem_face, elem_face_sign, face_edge,
            face_edge_sign, nv)
        return MeshEntities(
            num_vertices=nv, edges=edges, face_verts=face_verts,
            face_sorted=face_sorted, elem_edge=elem_edge,
            elem_edge_sign=elem_edge_sign, elem_face=elem_face,
            elem_face_sign=elem_face_sign, face_edge=face_edge,
            face_edge_sign=face_edge_sign, B0=B0, B1=B1, B2=B2)

    # ----- edges: unique sorted vertex pairs (packed-key unique) ------- #
    ev = elems[:, loc_edges]                    # (ne, n_le, 2) local dir
    lo = np.minimum(ev[:, :, 0], ev[:, :, 1]).astype(np.int64)
    hi = np.maximum(ev[:, :, 0], ev[:, :, 1]).astype(np.int64)
    ekeys, inv = np.unique(lo.ravel() * nv + hi.ravel(),
                           return_inverse=True)
    edges = np.stack([ekeys // nv, ekeys % nv], axis=1)
    elem_edge = inv.reshape(ne, n_le)
    elem_edge_sign = np.where(ev[:, :, 0] < ev[:, :, 1], 1.0, -1.0)

    # ----- faces: unique sorted tuples, creator-oriented cycles ------- #
    fv = elems[:, loc_faces]                    # (ne, n_lf, k)
    k = fv.shape[2]
    flatf = np.sort(fv, axis=2).reshape(-1, k)
    if k == 4 and nv < (1 << 31):
        # pack the sorted 4-tuples into two int64 keys: halves the
        # lexsort passes of the row-unique (the fine-build hot spot at
        # ~10^7 face instances); identical grouping (packing injective)
        packed = np.empty((flatf.shape[0], 2), dtype=np.int64)
        packed[:, 0] = flatf[:, 0].astype(np.int64) * nv + flatf[:, 1]
        packed[:, 1] = flatf[:, 2].astype(np.int64) * nv + flatf[:, 3]
        _, first_idx, invf = unique_rows(packed)
        uniq = flatf[first_idx]
    else:
        uniq, first_idx, invf = unique_rows(flatf)
    nface = uniq.shape[0]
    elem_face = invf.reshape(ne, n_lf)
    # stored cycle = local cycle of the first (creator) occurrence
    flat_cycles = fv.reshape(-1, k)
    face_verts = flat_cycles[first_idx]         # (nface, k)
    # sign: +1 if the element's outward cycle is a rotation of the stored
    # cycle, -1 if a rotation of its reversal — decided by whether the
    # vertex after cycle[0] matches (vectorized _cycle_sign)
    stored = face_verts[invf]                   # (N, k)
    N = flat_cycles.shape[0]
    j0 = np.argmax(stored == flat_cycles[:, :1], axis=1)
    ar = np.arange(N)[:, None]
    steps = np.arange(k)[None, :]
    # full rolled rows: a valid face is a rotation of the stored cycle
    # (fwd) or of its reversal (bwd); comparing only one neighbor would
    # accept e.g. (a,b,d,c) vs stored (a,b,c,d) as +1 on quads.
    fwd_roll = stored[ar, (j0[:, None] + steps) % k]
    bwd_roll = stored[ar, (j0[:, None] - steps) % k]
    fwd = np.all(flat_cycles == fwd_roll, axis=1)
    bwd = np.all(flat_cycles == bwd_roll, axis=1)
    assert np.all(fwd | bwd), \
        "faces share vertices but not as a cycle"
    elem_face_sign = np.where(fwd, 1.0, -1.0).reshape(ne, n_lf)
    counts = np.bincount(invf, minlength=nface)
    assert counts.max() <= 2, "non-manifold mesh"

    # ----- face_edge with traversal signs (searchsorted lookup) -------- #
    a = face_verts.astype(np.int64)
    b = np.roll(a, -1, axis=1)
    keys = np.minimum(a, b) * nv + np.maximum(a, b)
    face_edge = np.searchsorted(ekeys, keys)
    face_edge_sign = np.where(a < b, 1.0, -1.0)

    # ----- boundary operators ------------------------------------------ #
    B0, B1, B2 = _boundary_operators(
        ne, nface, edges, elem_face, elem_face_sign, face_edge,
        face_edge_sign, mesh.num_vertices)

    return MeshEntities(
        num_vertices=mesh.num_vertices,
        edges=edges,
        face_verts=face_verts,
        face_sorted=uniq,
        elem_edge=elem_edge,
        elem_edge_sign=elem_edge_sign,
        elem_face=elem_face,
        elem_face_sign=elem_face_sign,
        face_edge=face_edge,
        face_edge_sign=face_edge_sign,
        B0=B0, B1=B1, B2=B2,
    )


def _boundary_operators(ne, nface, edges, elem_face, elem_face_sign,
                        face_edge, face_edge_sign, nv):
    """Direct CSR construction of B0/B1/B2 (uniform row arity: indptr is an
    arange and per-row column sorting is one axis-1 argsort — skips the
    COO->CSR global sort that dominated the operator build at ~10^7 nnz)."""
    def _uniform_csr(cols, vals, n_cols):
        n, k = cols.shape
        order = np.argsort(cols, axis=1, kind="stable")
        indices = np.take_along_axis(cols, order, axis=1).ravel()
        data = np.take_along_axis(vals, order, axis=1).ravel()
        indptr = np.arange(n + 1, dtype=np.int64) * k
        return sp.csr_matrix((data, indices, indptr), shape=(n, n_cols))

    B0 = _uniform_csr(elem_face, elem_face_sign, nface)
    B1 = _uniform_csr(face_edge, face_edge_sign, edges.shape[0])
    nedge = edges.shape[0]
    # edge rows: (tail, head) with tail < head -> columns already sorted
    icols = np.empty((nedge, 2), dtype=np.int64)
    icols[:, 0] = edges[:, 0]
    icols[:, 1] = edges[:, 1]
    idata = np.empty((nedge, 2))
    idata[:, 0] = -1.0
    idata[:, 1] = 1.0
    B2 = sp.csr_matrix(
        (idata.ravel(), icols.ravel(),
         np.arange(nedge + 1, dtype=np.int64) * 2),
        shape=(nedge, nv))
    return B0, B1, B2


def lookup_rows(table, queries):
    """Row ids of `queries` within `table` (any row order): returns ids such
    that table[out[i]] == queries[i]; raises if a query row is absent."""
    sorted_rows = np.asarray(table, dtype=np.int64)
    queries = np.asarray(queries, dtype=np.int64)
    order = np.lexsort(sorted_rows.T[::-1])
    srt = sorted_rows[order]
    # lexicographic searchsorted via big-endian void view (non-negative ints
    # compare correctly byte-wise in big-endian)
    k = srt.shape[1]
    dt = np.dtype((np.void, 8 * k))
    sv = np.ascontiguousarray(srt.astype(">i8")).view(dt).ravel()
    qv = np.ascontiguousarray(queries.astype(">i8")).view(dt).ravel()
    pos = np.searchsorted(sv, qv)
    ok = (pos < sv.size) & (sv[np.minimum(pos, sv.size - 1)] == qv)
    if not ok.all():
        raise KeyError("row not found in table")
    return order[pos]


def bdr_face_ids(mesh, ents: MeshEntities):
    """Map each mesh boundary face to its global face id (vectorized)."""
    return lookup_rows(ents.face_sorted, np.sort(mesh.bdr_faces, axis=1))


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
