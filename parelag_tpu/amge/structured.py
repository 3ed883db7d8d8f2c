"""Device-resident AMGe setup for cartesian-nested hex grids.

The generic coarsening engine (amge/sequence.py) is host-resident by
necessity on remote-attached chips: its per-AE batches are tens-to-
hundreds of MB per level and the axon link moves 52 MB/s up / 10 MB/s
down (DESIGN.md section 9), so shipping assembled stacks can never win.
This module is the TPU-first answer for the structured case the
flagship benchmarks actually run (cartesian 2x2x2 agglomeration of a
hex grid, polynomial order-0 upscaling targets — bench.py lane_h1 /
lane_setup, and the SPE10 north-star grid): on a cartesian-nested
partition every agglomerate of every level has the *same* local
structure, with order-0 targets every trace/bubble SVD keeps exactly
zero extra modes (asserted at runtime, not assumed), and the coarse
de Rham sequence is again a staggered grid with one dof per coarse
entity.  Consequently

  * every stage of Coarsen() is ONE uniform batched dense operation
    (assemble -> solve -> emit) over all agglomerated entities of a
    family — no ragged shapes, no shape groups, no index CSRs;
  * the per-stage kernel shapes are LEVEL-INDEPENDENT (the coarse level
    is self-similar to the fine one), so the whole multilevel setup
    compiles a fixed, small set of XLA programs;
  * the only host->device traffic is the fine-grid geometry/coefficient
    data and int32 entity-id arrays (MBs), and the only device->host
    traffic is per-stage kept-mode counts (bytes): P, coarse D, coarse
    local masses and the level operators stay device-resident for the
    solve phase that consumes them.

Reference mapping (math identical to the generic engine, which itself
cites the C++ source): trace stage = ComputeCoarseTracesWithTargets
(DeRhamSequence.cpp:1723-2086), Lagrange extension = hFacetExtension
(DeRhamSequence.cpp:2169-2628), [M B^T; B -C] extension =
hRidgePeakExtension (DeRhamSequence.cpp:2609-2656); the batched
formulas mirror amge/sequence.py::_compute_coarse_traces/_extension
line for line (that host path is the digit-parity oracle in
tests/test_structured.py).

Conventions (self-consistent; parity with the host engine is asserted
through convention-free quantities — upscaling errors, invariants,
operator spectra — and through explicit entity remaps in the tests):
  * H1 dofs = vertex values; Hcurl = edge circulations (tangent +axis);
    Hdiv = face fluxes (normal +axis); L2 = cell values.
  * grad rows: [-1 at tail, +1 at head].  curl rows: ccw circulation
    seen from the +a normal, stored in the canonical per-face edge
    order [eb(c0), eb(c1), ec(b0), ec(b1)] (signs D1_FAMILY_SIGNS).
    div rows: (+out - in)/cell_volume.
  * entity numbering is lexicographic (x fastest) per family; face and
    edge families are ordered [x; y; z].
"""

from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------- #
# host index plane: entity numbering and per-level id arrays
# --------------------------------------------------------------------- #


def _lex(i, j, k, ni, nj):
    return i + ni * (j + nj * k)


def grid_counts(shape):
    """Entity counts for a (nx, ny, nz) cell grid: cells, faces (x,y,z
    families), edges (x,y,z families), vertices."""
    nx, ny, nz = shape
    nc = nx * ny * nz
    nf = ((nx + 1) * ny * nz, nx * (ny + 1) * nz, nx * ny * (nz + 1))
    ne = (nx * (ny + 1) * (nz + 1), (nx + 1) * ny * (nz + 1),
          (nx + 1) * (ny + 1) * nz)
    nv = (nx + 1) * (ny + 1) * (nz + 1)
    return nc, nf, ne, nv


def face_id(shape, axis, i, j, k):
    """Face id within the global face numbering ([x|y|z] families).
    (i, j, k) are the face's own lattice coordinates: for axis=0 the
    x-coordinate i ranges 0..nx while j, k range over cells."""
    nx, ny, nz = shape
    dims = ((nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1))
    off = 0
    for a in range(axis):
        off += dims[a][0] * dims[a][1] * dims[a][2]
    ni, nj, _ = dims[axis]
    return off + _lex(i, j, k, ni, nj)


def edge_id(shape, axis, i, j, k):
    """Edge id ([x|y|z] families); for axis=0 the x-coordinate i ranges
    over cells 0..nx-1 while j, k range over vertices."""
    nx, ny, nz = shape
    dims = ((nx, ny + 1, nz + 1), (nx + 1, ny, nz + 1),
            (nx + 1, ny + 1, nz))
    off = 0
    for a in range(axis):
        off += dims[a][0] * dims[a][1] * dims[a][2]
    ni, nj, _ = dims[axis]
    return off + _lex(i, j, k, ni, nj)


def vert_id(shape, i, j, k):
    nx, ny, nz = shape
    return _lex(i, j, k, nx + 1, ny + 1)


def cell_id(shape, i, j, k):
    nx, ny, nz = shape
    return _lex(i, j, k, nx, ny)


def _grid3(*ranges):
    """meshgrid of index ranges -> flat (n, len(ranges)) int array,
    x fastest (lexicographic)."""
    gs = np.meshgrid(*ranges, indexing="ij")
    return np.stack([g.transpose(2, 1, 0).ravel() for g in gs], axis=1)


# --------------------------------------------------------------------- #
# fine level: analytic local matrices on a uniform brick grid
# --------------------------------------------------------------------- #

def _m1(h):
    """1D P1 mass on an interval of length h."""
    return (h / 6.0) * np.array([[2.0, 1.0], [1.0, 2.0]])


def fine_local_masses(h, dtype=np.float64):
    """Reference local mass matrices per (codim, jform) slot for a
    uniform brick cell of size h=(hx,hy,hz).  Local dof orderings:

      M00 (8x8):  cell vertices, lexicographic (x fastest)
      M10 (4x4):  face vertices, lexicographic in the face plane (per
                  axis family: the two in-plane axes in (b, c) order
                  where (b, c) = axes != a, b < c)
      M20 (2x2):  edge endpoints (tail, head)
      M30 (1x1):  vertex
      M01 (12x12): cell edges [4 x-edges (lex in (y,z)); 4 y; 4 z]
      M11 (4x4):  face edges [2 along b (lex in c); 2 along c (lex in b)]
      M21 (1x1):  edge
      M02 (6x6):  cell faces [x(i),x(i+1); y; z]
      M12 (1x1):  face
      M03 (1x1):  cell (value dofs: mass = cell volume)

    Returns dict keyed (codim, jform); face/edge-family-dependent slots
    map to a tuple of 3 per-axis matrices.
    """
    hx, hy, hz = (float(v) for v in h)
    m = {0: _m1(hx), 1: _m1(hy), 2: _m1(hz)}
    vol = hx * hy * hz

    def kron(*ms):
        out = ms[0]
        for mm in ms[1:]:
            out = np.kron(mm, out)   # x fastest => later axes outermost
        return out

    out = {}
    out[(0, 0)] = kron(m[0], m[1], m[2])
    out[(1, 0)] = tuple(
        kron(m[b], m[c])
        for a, (b, c) in enumerate(((1, 2), (0, 2), (0, 1))))
    out[(2, 0)] = (m[0], m[1], m[2])
    out[(3, 0)] = np.array([[1.0]])

    # ND0: same-axis block for axis a = (m_b x m_c) / h_a (circulation
    # dofs; dual basis carries 1/h_a), cross-axis zero.
    hh = (hx, hy, hz)
    nd_blocks = []
    for a, (b, c) in enumerate(((1, 2), (0, 2), (0, 1))):
        nd_blocks.append(kron(m[b], m[c]) / hh[a])
    M01 = np.zeros((12, 12))
    for a in range(3):
        M01[4 * a:4 * a + 4, 4 * a:4 * a + 4] = nd_blocks[a]
    out[(0, 1)] = M01
    # face (normal axis a, in-plane (b, c)): edges [2 along b; 2 along c]
    m11 = []
    for a, (b, c) in enumerate(((1, 2), (0, 2), (0, 1))):
        blk = np.zeros((4, 4))
        blk[:2, :2] = m[c] / hh[b]
        blk[2:, 2:] = m[b] / hh[c]
        m11.append(blk)
    out[(1, 1)] = tuple(m11)
    out[(2, 1)] = tuple(np.array([[1.0 / hh[a]]]) for a in range(3))

    # RT0: axis-a pair block m_a / (h_b h_c) (flux dofs).
    M02 = np.zeros((6, 6))
    for a, (b, c) in enumerate(((1, 2), (0, 2), (0, 1))):
        M02[2 * a:2 * a + 2, 2 * a:2 * a + 2] = m[a] / (hh[b] * hh[c])
    out[(0, 2)] = M02
    out[(1, 2)] = tuple(np.array([[1.0 / (hh[b] * hh[c])]])
                        for a, (b, c) in
                        enumerate(((1, 2), (0, 2), (0, 1))))
    out[(0, 3)] = np.array([[vol]])

    return {k: (tuple(x.astype(dtype) for x in v)
                if isinstance(v, tuple) else v.astype(dtype))
            for k, v in out.items()}


def fine_derivative_values(shape, h, dtype=np.float64):
    """Per-row value arrays of the fine D operators in the fixed column
    patterns of this module:

      D0: (n_edges, 2)  cols [tail, head] vertices       -> [-1, +1]
      D1: (n_faces, 4)  cols [eb(c0), eb(c1), ec(b0), ec(b1)]
                                      -> per-family D1_FAMILY_SIGNS
      D2: (n_cells, 6)  cols [fx0,fx1,fy0,fy1,fz0,fz1]   -> (+-1)/vol

    Values are returned (patterns are implicit in the column builders
    below); at coarse levels the same patterns carry computed values.
    """
    nc, nf, ne, nv = grid_counts(shape)
    vol = float(np.prod(h))
    d0 = np.tile(np.array([-1.0, 1.0], dtype=dtype), (sum(ne), 1))
    d1 = np.concatenate([
        np.tile(D1_FAMILY_SIGNS[a].astype(dtype), (nf[a], 1))
        for a in range(3)], axis=0)
    d2 = np.tile(
        np.array([-1.0, 1.0, -1.0, 1.0, -1.0, 1.0], dtype=dtype) / vol,
        (nc, 1))
    return d0, d1, d2


def d0_cols(shape):
    """(n_edges, 2) vertex column ids matching fine_derivative_values."""
    nx, ny, nz = shape
    cols = []
    for a in range(3):
        dims = [(nx, ny + 1, nz + 1), (nx + 1, ny, nz + 1),
                (nx + 1, ny + 1, nz)][a]
        # _grid3 columns are already (x, y, z) lattice coordinates
        ijk = _grid3(range(dims[0]), range(dims[1]), range(dims[2]))
        head = ijk.copy()
        head[:, a] += 1
        tail = vert_id(shape, ijk[:, 0], ijk[:, 1], ijk[:, 2])
        headv = vert_id(shape, head[:, 0], head[:, 1], head[:, 2])
        cols.append(np.stack([tail, headv], axis=1))
    return np.concatenate(cols, axis=0)


def d1_cols(shape):
    """(n_faces, 4) edge column ids of the curl rows, in the CANONICAL
    per-face edge order [eb at c0, eb at c1, ec at b0, ec at b1] with
    (b, c) the in-plane axes, b < c — the same order as the M11 blocks
    (face_edges_m), so that coarse-level curl values emitted by the
    facet extension stage land in the same pattern.  The ccw-circulation
    signs in this order are D1_FAMILY_SIGNS[a] (the (b, c) = (x, z)
    pair of the y-family is anti-cyclic, flipping its signs)."""
    return face_edges_m(shape)


# ccw circulation signs (Stokes, right-hand rule around the +a normal)
# expressed in the canonical [eb(c0), eb(c1), ec(b0), ec(b1)] order:
D1_FAMILY_SIGNS = np.array([
    [1.0, -1.0, -1.0, 1.0],     # +x: (b,c)=(y,z) cyclic
    [-1.0, 1.0, 1.0, -1.0],     # +y: (b,c)=(x,z) anti-cyclic
    [1.0, -1.0, -1.0, 1.0],     # +z: (b,c)=(x,y) cyclic
])


def d2_cols(shape):
    """(n_cells, 6) face column ids [fx(i),fx(i+1),fy(j),fy(j+1),
    fz(k),fz(k+1)]."""
    nx, ny, nz = shape
    ijk = _grid3(range(nx), range(ny), range(nz))
    i, j, k = ijk[:, 0], ijk[:, 1], ijk[:, 2]
    return np.stack([
        face_id(shape, 0, i, j, k), face_id(shape, 0, i + 1, j, k),
        face_id(shape, 1, i, j, k), face_id(shape, 1, i, j + 1, k),
        face_id(shape, 2, i, j, k), face_id(shape, 2, i, j, k + 1),
    ], axis=1)


# --------------------------------------------------------------------- #
# entity-dof maps (host, int arithmetic; also the device gather plans)
# --------------------------------------------------------------------- #

def cell_verts(shape):
    """(n_cells, 8) vertex ids, lexicographic (x fastest) within the
    cell — matches the M00 kron ordering."""
    nx, ny, nz = shape
    ijk = _grid3(range(nx), range(ny), range(nz))
    i, j, k = ijk[:, 0], ijk[:, 1], ijk[:, 2]
    out = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out.append(vert_id(shape, i + dx, j + dy, k + dz))
    return np.stack(out, axis=1)


def cell_edges(shape):
    """(n_cells, 12) edge ids [4 x-edges (y fastest); 4 y-edges
    (x fastest); 4 z-edges (x fastest)] — matches the M01 ordering."""
    nx, ny, nz = shape
    ijk = _grid3(range(nx), range(ny), range(nz))
    i, j, k = ijk[:, 0], ijk[:, 1], ijk[:, 2]
    cols = []
    for a in range(3):
        b, c = [ax for ax in range(3) if ax != a]
        base = np.stack([i, j, k], axis=1)
        for dc in (0, 1):
            for db in (0, 1):
                co = base.copy()
                co[:, b] += db
                co[:, c] += dc
                cols.append(edge_id(shape, a, co[:, 0], co[:, 1],
                                    co[:, 2]))
    return np.stack(cols, axis=1)


def cell_faces(shape):
    """(n_cells, 6) — identical to d2_cols (matches the M02 ordering)."""
    return d2_cols(shape)


def face_verts(shape):
    """(n_faces, 4) vertex ids per face, (b, c)-lex (b fastest) —
    matches the M10 kron ordering."""
    nx, ny, nz = shape
    cols = []
    for a in range(3):
        b, c = [ax for ax in range(3) if ax != a]
        dims = [(nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1)][a]
        ijk = _grid3(range(dims[0]), range(dims[1]), range(dims[2]))
        out = []
        for dc in (0, 1):
            for db in (0, 1):
                co = ijk.copy()
                co[:, b] += db
                co[:, c] += dc
                out.append(vert_id(shape, co[:, 0], co[:, 1], co[:, 2]))
        cols.append(np.stack(out, axis=1))
    return np.concatenate(cols, axis=0)


def face_edges_m(shape):
    """(n_faces, 4) edge ids [eb at c0, eb at c1, ec at b0, ec at b1] —
    matches the M11 block ordering (NOT the ccw d1 ordering)."""
    nx, ny, nz = shape
    cols = []
    for a in range(3):
        b, c = [ax for ax in range(3) if ax != a]
        dims = [(nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1)][a]
        ijk = _grid3(range(dims[0]), range(dims[1]), range(dims[2]))

        def ecol(axis, db, dc):
            co = ijk.copy()
            co[:, b] += db
            co[:, c] += dc
            return edge_id(shape, axis, co[:, 0], co[:, 1], co[:, 2])

        cols.append(np.stack([ecol(b, 0, 0), ecol(b, 0, 1),
                              ecol(c, 0, 0), ecol(c, 1, 0)], axis=1))
    return np.concatenate(cols, axis=0)


def edge_verts(shape):
    """(n_edges, 2) — identical to d0_cols."""
    return d0_cols(shape)


def assemble_global(blocks, dofmap, ndofs):
    """Host CSR from per-entity local blocks.  blocks: (n, k, k) or a
    single (k, k) broadcast; dofmap: (n, k)."""
    import scipy.sparse as sp
    dofmap = np.asarray(dofmap)
    n, k = dofmap.shape
    blocks = np.broadcast_to(np.asarray(blocks), (n, k, k))
    rows = np.repeat(dofmap, k, axis=1).ravel()
    cols = np.tile(dofmap, (1, k)).ravel()
    return sp.coo_matrix(
        (blocks.ravel(), (rows, cols)), shape=(ndofs, ndofs)).tocsr()


def assemble_d_csr(dvals, dcols, shape_mat):
    """Host CSR of a derivative operator from its per-row value array
    and static column pattern."""
    import scipy.sparse as sp
    dvals = np.asarray(dvals)
    n, k = dvals.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    return sp.coo_matrix(
        (dvals.ravel(), (rows, np.asarray(dcols).ravel())),
        shape=shape_mat).tocsr()


def fine_global_masses(shape, h, dtype=np.float64, coeff=None):
    """Host global mass CSRs per form (for parity tests and operator
    assembly); coeff: optional per-cell scalar weighting of the codim-0
    masses (SPE10-class heterogeneity)."""
    ref = fine_local_masses(h, dtype)
    nc, nf, ne, nv = grid_counts(shape)

    def wblk(M):
        if coeff is None:
            return M
        return np.asarray(coeff, dtype)[:, None, None] * M

    return {
        0: assemble_global(wblk(ref[(0, 0)]), cell_verts(shape), nv),
        1: assemble_global(wblk(ref[(0, 1)]), cell_edges(shape),
                           sum(ne)),
        2: assemble_global(wblk(ref[(0, 2)]), cell_faces(shape),
                           sum(nf)),
        3: assemble_global(wblk(ref[(0, 3)]),
                           np.arange(nc, dtype=np.int64)[:, None], nc),
    }


# --------------------------------------------------------------------- #
# coarse->fine child id arrays (factor-2 nesting)
# --------------------------------------------------------------------- #

def children_cells(cshape):
    """(n_coarse_cells, 8) fine cell ids, subgrid-lex (dx fastest)."""
    fshape = tuple(2 * s for s in cshape)
    ijk = _grid3(range(cshape[0]), range(cshape[1]), range(cshape[2]))
    out = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out.append(cell_id(fshape, 2 * ijk[:, 0] + dx,
                                   2 * ijk[:, 1] + dy, 2 * ijk[:, 2] + dz))
    return np.stack(out, axis=1)


def children_faces(cshape):
    """(n_coarse_faces, 4) fine face ids per coarse face, in-plane
    (b, c)-lex (b fastest) — the canonical facet-children order."""
    fshape = tuple(2 * s for s in cshape)
    nx, ny, nz = cshape
    cols = []
    for a in range(3):
        b, c = [ax for ax in range(3) if ax != a]
        dims = [(nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1)][a]
        ijk = _grid3(range(dims[0]), range(dims[1]), range(dims[2]))
        out = []
        for dc in (0, 1):
            for db in (0, 1):
                co = 2 * ijk
                co[:, a] = 2 * ijk[:, a]          # vertex-line coord
                co[:, b] += db
                co[:, c] += dc
                out.append(face_id(fshape, a, co[:, 0], co[:, 1],
                                   co[:, 2]))
        cols.append(np.stack(out, axis=1))
    return np.concatenate(cols, axis=0)


def children_edges(cshape):
    """(n_coarse_edges, 2) fine edge ids per coarse edge, lex along the
    edge axis."""
    fshape = tuple(2 * s for s in cshape)
    nx, ny, nz = cshape
    cols = []
    for a in range(3):
        dims = [(nx, ny + 1, nz + 1), (nx + 1, ny, nz + 1),
                (nx + 1, ny + 1, nz)][a]
        ijk = _grid3(range(dims[0]), range(dims[1]), range(dims[2]))
        out = []
        for da in (0, 1):
            co = 2 * ijk
            co[:, a] += da
            out.append(edge_id(fshape, a, co[:, 0], co[:, 1], co[:, 2]))
        cols.append(np.stack(out, axis=1))
    return np.concatenate(cols, axis=0)


def children_verts(cshape):
    """(n_coarse_verts,) fine vertex ids of the coarse lattice points."""
    fshape = tuple(2 * s for s in cshape)
    nx, ny, nz = cshape
    ijk = _grid3(range(nx + 1), range(ny + 1), range(nz + 1))
    return vert_id(fshape, 2 * ijk[:, 0], 2 * ijk[:, 1], 2 * ijk[:, 2])


# --------------------------------------------------------------------- #
# static 2x2x2-subgrid patterns (level-independent)
# --------------------------------------------------------------------- #

_S = (2, 2, 2)


def _subgrid_face_slots():
    """Canonical order of the 36 subgrid faces: [12 interior (family a
    at mid-plane, (b,c)-lex); 24 boundary grouped by coarse facet in
    [x0,x1,y0,y1,z0,z1] order, each facet's 4 children (b,c)-lex].
    Returns slot_of_face (36,): subgrid face id -> slot."""
    nc, nf, ne, nv = grid_counts(_S)
    order = []
    for a in range(3):                      # interior: axis coord == 1
        b, c = [ax for ax in range(3) if ax != a]
        for dc in (0, 1):
            for db in (0, 1):
                co = [0, 0, 0]
                co[a], co[b], co[c] = 1, db, dc
                order.append(face_id(_S, a, *co))
    for a in range(3):                      # boundary facets a0, a1
        b, c = [ax for ax in range(3) if ax != a]
        for side in (0, 2):
            for dc in (0, 1):
                for db in (0, 1):
                    co = [0, 0, 0]
                    co[a], co[b], co[c] = side, db, dc
                    order.append(face_id(_S, a, *co))
    order = np.array(order)
    assert len(set(order.tolist())) == sum(nf) == 36
    slot = np.zeros(sum(nf), dtype=np.int64)
    slot[order] = np.arange(36)
    return slot


def _subgrid_u_faces(cshape):
    """(n_coarse_cells, 36) fine face ids of each coarse cell's subgrid
    faces, in the canonical 36-slot order."""
    fshape = tuple(2 * s for s in cshape)
    slot = _subgrid_face_slots()
    # subgrid face id -> (family, local lattice coords)
    inv = np.empty((36, 4), dtype=np.int64)
    for a in range(3):
        dims = [(3, 2, 2), (2, 3, 2), (2, 2, 3)][a]
        for x in range(dims[0]):
            for y in range(dims[1]):
                for z in range(dims[2]):
                    inv[face_id(_S, a, x, y, z)] = (a, x, y, z)
    ijk = _grid3(range(cshape[0]), range(cshape[1]), range(cshape[2]))
    out = np.empty((len(ijk), 36), dtype=np.int64)
    for sf in range(36):
        a, x, y, z = inv[sf]
        out[:, slot[sf]] = face_id(
            fshape, a, 2 * ijk[:, 0] + x, 2 * ijk[:, 1] + y,
            2 * ijk[:, 2] + z)
    return out


def _cell_stage_patterns_hdiv():
    """Static patterns of the Hdiv interior (Lagrange) extension:
      fslot:  (8, 6)  child-cell face -> 36-slot (M02 local order)
    The 36-slot order puts the 12 interior faces first and the boundary
    faces facet-by-facet, so Pb rows are [4*f + i] for facet f child i."""
    slot = _subgrid_face_slots()
    return slot[cell_faces(_S)]


# --------------------------------------------------------------------- #
# level state
# --------------------------------------------------------------------- #

@dataclass
class StructuredLevel:
    """Per-level value plane (device arrays) of the structured engine.

    Local mass families follow the canonical local orders documented in
    fine_local_masses; derivative value arrays follow the d0/d1/d2
    column patterns.  At coarse (ALG) levels the PV traces are all ones
    (the reference's +-1-at-PV-dof convention with this module's
    axis-aligned orientations), so only the level-0 state carries
    nontrivial pv arrays."""
    shape: tuple
    m00: object = None      # (nc, 8, 8)
    m10: object = None      # (nf, 4, 4)
    m20: object = None      # (ne, 2, 2)
    m01: object = None      # (nc, 12, 12)
    m11: object = None      # (nf, 4, 4)
    m21: object = None      # (ne,)
    m02: object = None      # (nc, 6, 6)
    m12: object = None      # (nf,)
    m03: object = None      # (nc,)
    d0: object = None       # (ne, 2)
    d1: object = None       # (nf, 4)
    d2: object = None       # (nc, 6)
    pv1: object = None      # (ne,)
    pv2: object = None      # (nf,)
    t0: object = None       # (nv, k0)
    t1: object = None       # (ne, k1)
    t2: object = None       # (nf, k2)
    t3: object = None       # (nc, k3)


def fine_level(shape, h=None, dtype=np.float64, coeff=None,
               l2_weight=None) -> StructuredLevel:
    """Level-0 state of the structured engine on a [0,1]^3-style brick
    grid (h defaults to 1/shape per axis).  coeff: per-cell scalar
    weighting the codim-0 masses of all forms (heterogeneous media);
    l2_weight: separate per-cell weight for the L2 mass (Darcy W)."""
    if h is None:
        h = tuple(1.0 / s for s in shape)
    nc, nf, ne, nv = grid_counts(shape)
    ref = fine_local_masses(h, dtype)
    dt = np.dtype(dtype)

    def bc(M, n):
        return jnp.broadcast_to(jnp.asarray(M, dtype=dt), (n,) + M.shape)

    def fam(Ms, counts):
        return jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(M, dtype=dt),
                             (cnt,) + M.shape)
            for M, cnt in zip(Ms, counts)], axis=0)

    c = (jnp.asarray(coeff, dtype=dt) if coeff is not None
         else jnp.ones(nc, dtype=dt))
    w = (jnp.asarray(l2_weight, dtype=dt) if l2_weight is not None
         else c)
    lvl = StructuredLevel(shape=shape)
    lvl.m00 = c[:, None, None] * bc(ref[(0, 0)], nc)
    lvl.m01 = c[:, None, None] * bc(ref[(0, 1)], nc)
    lvl.m02 = c[:, None, None] * bc(ref[(0, 2)], nc)
    lvl.m03 = w * float(ref[(0, 3)][0, 0])
    lvl.m10 = fam(ref[(1, 0)], nf)
    lvl.m11 = fam(ref[(1, 1)], nf)
    lvl.m12 = jnp.concatenate([
        jnp.full(nf[a], float(ref[(1, 2)][a][0, 0]), dtype=dt)
        for a in range(3)])
    lvl.m20 = fam(ref[(2, 0)], ne)
    lvl.m21 = jnp.concatenate([
        jnp.full(ne[a], float(ref[(2, 1)][a][0, 0]), dtype=dt)
        for a in range(3)])
    d0, d1, d2 = fine_derivative_values(shape, h, dt)
    lvl.d0, lvl.d1, lvl.d2 = (jnp.asarray(x) for x in (d0, d1, d2))
    # PV traces: Hcurl = unit tangent (circulation = h_a), Hdiv = unit
    # normal (flux = area); H1/L2 = 1 (fespace.compute_pv_traces)
    lvl.pv1 = jnp.concatenate([
        jnp.full(ne[a], float(h[a]), dtype=dt) for a in range(3)])
    areas = (h[1] * h[2], h[0] * h[2], h[0] * h[1])
    lvl.pv2 = jnp.concatenate([
        jnp.full(nf[a], float(areas[a]), dtype=dt) for a in range(3)])
    # order-0 polynomial upscaling targets (SetUpscalingTargets):
    # constants for H1/L2, the three unit fields for Hcurl/Hdiv
    lvl.t0 = jnp.ones((nv, 1), dtype=dt)
    lvl.t3 = jnp.ones((nc, 1), dtype=dt)
    lvl.t1 = jnp.concatenate([
        jnp.broadcast_to(
            (jnp.eye(3, dtype=dt) * jnp.asarray(h, dtype=dt))[a],
            (ne[a], 3))
        for a in range(3)], axis=0)
    lvl.t2 = jnp.concatenate([
        jnp.broadcast_to(
            (jnp.eye(3, dtype=dt) * jnp.asarray(areas, dtype=dt))[a],
            (nf[a], 3))
        for a in range(3)], axis=0)
    return lvl


# --------------------------------------------------------------------- #
# stage cores (jittable)
# --------------------------------------------------------------------- #

def _solve_batch(A, rhs):
    """Batched dense solve; the device-path strategy (direct vs
    Newton-Schulz f32) is chosen by the caller via jit wrapping."""
    return jnp.linalg.solve(A, rhs)


def _trace_scalar_stage(m_children, pv_children, t_children):
    """Generic trace stage with 1x1 child blocks (L2 / Hdiv-facet /
    Hcurl-edge traces; ComputeCoarseTracesWithTargets restricted to the
    pure-PV outcome): returns (Ptr, F, cm, t_coarse, max_rel_sv) where
    max_rel_sv is the largest deflated singular value relative to the
    PV norm (must sit below the SVD keep-threshold for the static
    structure to be valid — asserted by the driver)."""
    mpv = m_children * pv_children
    dots = jnp.sum(pv_children * mpv, axis=1)
    F = mpv / dots[:, None]
    kt = t_children.shape[2]
    t_coarse = jnp.einsum("nk,nkt->nt", F, t_children)
    Td = t_children - pv_children[:, :, None] * t_coarse[:, None, :]
    w = Td * jnp.sqrt(m_children)[:, :, None]
    G = jnp.einsum("nkt,nks->nts", w, w)
    ev = jnp.linalg.eigvalsh(G)
    max_rel = jnp.max(jnp.sqrt(jnp.clip(ev, 0.0, None))
                      / dots[:, None]) if kt else jnp.zeros(())
    return pv_children, F, dots, t_coarse, max_rel


_HDIV_CELL_ROWS24 = np.arange(24)
_HDIV_CELL_COLS24 = np.repeat(np.arange(6), 4)


def _hdiv_interior_stage(m02_ch, vols_ch, d2_ch, ptr3, ptr2_cf, t2_u,
                         fslot):
    """Hdiv interior Lagrange extension (hFacetExtension for jform=2):
    per coarse cell, u = 36 subgrid faces (12 interior first), p = 8
    child cells, one PV multiplier.  Inputs are pre-gathered:
      m02_ch (n,8,6,6), vols_ch (n,8), d2_ch (n,8,6), ptr3 (n,8),
      ptr2_cf (n,6,4) facet-trace P values, t2_u (n,36,kt) Hdiv targets
      on the u dofs (slot order), fslot (8,6) static.
    Returns (Pint (n,12,6), d2c (n,6), cm (n,6,6), bub_sv_rel)."""
    n = m02_ch.shape[0]
    dt = m02_ch.dtype
    idx = (fslot[:, :, None] * 36 + fslot[:, None, :]).reshape(-1)
    Mae = jnp.zeros((n, 36 * 36), dtype=dt).at[:, idx].add(
        m02_ch.reshape(n, -1)).reshape(n, 36, 36)
    Dloc = jnp.zeros((n, 8, 36), dtype=dt).at[
        :, np.arange(8)[:, None], fslot].set(d2_ch)
    B = vols_ch[:, :, None] * Dloc                  # (n, 8, 36)
    T = vols_ch * ptr3                              # (n, 8)
    Pb = jnp.zeros((n, 24, 6), dtype=dt).at[
        :, _HDIV_CELL_ROWS24, _HDIV_CELL_COLS24].set(
        ptr2_cf.reshape(n, 24))          # row 4*f + i <- facet f child i
    M_ii, M_ib = Mae[:, :12, :12], Mae[:, :12, 12:]
    B_ii, B_ib = B[:, :, :12], B[:, :, 12:]

    A = jnp.zeros((n, 21, 21), dtype=dt)
    A = A.at[:, :12, :12].set(M_ii)
    A = A.at[:, 12:20, :12].set(B_ii)
    A = A.at[:, :12, 12:20].set(B_ii.transpose(0, 2, 1))
    A = A.at[:, 20, 12:20].set(T)
    A = A.at[:, 12:20, 20].set(T)

    kt = t2_u.shape[2]
    t_int, t_bdr = t2_u[:, :12], t2_u[:, 12:]
    rhs = jnp.zeros((n, 21, 6 + kt), dtype=dt)
    rhs = rhs.at[:, :12, :6].set(-(M_ib @ Pb))
    rhs = rhs.at[:, 12:20, :6].set(-(B_ib @ Pb))
    rhs = rhs.at[:, :12, 6:].set(-(M_ib @ t_bdr))
    rhs = rhs.at[:, 12:20, 6:].set(B_ii @ t_int)

    X = _solve_batch(A, rhs)
    Pint = X[:, :12, :6]
    lam = X[:, 20, :6]
    eps = jnp.asarray(np.finfo(np.float64).eps, dtype=dt)
    d2c = jnp.where(jnp.abs(lam) > eps, -lam, jnp.zeros_like(lam))
    bub = t_int - X[:, :12, 6:]
    G = jnp.einsum("nit,nis->nts", bub, bub)
    bub_sv = jnp.sqrt(jnp.clip(jnp.max(jnp.linalg.eigvalsh(G)),
                               0.0, None)) if kt else jnp.zeros(())
    basis = jnp.concatenate([Pint, Pb], axis=1)     # (n, 36, 6)
    cm = jnp.einsum("nik,nij,njl->nkl", basis, Mae, basis)
    cm = 0.5 * (cm + cm.transpose(0, 2, 1))
    return Pint, d2c, cm, bub_sv


# --------------------------------------------------------------------- #
# level driver: Darcy chain (L2 + Hdiv) — jform_start=2 in the generic
# engine's terms
# --------------------------------------------------------------------- #

@dataclass
class DarcyLevelOut:
    """Per-level outputs of the Hdiv-L2 coarsening (device arrays +
    host id arrays for materialization)."""
    cshape: tuple
    ptr3: object            # (ncc, 8)   L2 trace P values
    f3: object              # (ncc, 8)   L2 cochain functionals
    ptr2: object            # (ncf, 4)   Hdiv facet-trace P values
    f2: object              # (ncf, 4)
    pint2: object           # (ncc, 12, 6) Hdiv interior P values
    d2c: object             # (ncc, 6)   coarse div values
    cc: object = None       # (ncc, 8)   fine cell ids (host)
    cf: object = None       # (ncf, 4)   fine face ids (host)
    cfaces: object = None   # (ncc, 6)   coarse facet ids (host)
    ufaces: object = None   # (ncc, 36)  fine face ids, slot order (host)
    max_rel_sv: float = 0.0
    bub_sv: float = 0.0


def coarsen_darcy(lvl: StructuredLevel, svd_tol=1e-9):
    """One structured coarsening step of the Hdiv x L2 pair (the
    reference's form_start=2 configuration: MultigridTestDarcy /
    SPE10).  Returns (coarse_level, DarcyLevelOut)."""
    shape = lvl.shape
    assert all(s % 2 == 0 for s in shape), shape
    cshape = tuple(s // 2 for s in shape)
    cc = children_cells(cshape)
    cf = children_faces(cshape)
    cfaces = d2_cols(cshape)
    ufaces = _subgrid_u_faces(cshape)
    fslot = _cell_stage_patterns_hdiv()

    jcc, jcf, jcfaces, jufaces = (jnp.asarray(x, dtype=jnp.int32)
                                  for x in (cc, cf, cfaces, ufaces))
    dt = lvl.m03.dtype
    pv3 = jnp.ones(lvl.m03.shape[0], dtype=dt)

    # --- stage T3: L2 traces --------------------------------------- #
    ptr3, f3, m03c, t3c, sv3 = _trace_scalar_stage(
        lvl.m03[jcc], pv3[jcc], lvl.t3[jcc])
    # --- stage T2: Hdiv facet traces -------------------------------- #
    ptr2, f2, m12c, t2c, sv2 = _trace_scalar_stage(
        lvl.m12[jcf], lvl.pv2[jcf], lvl.t2[jcf])
    # --- stage E2: Hdiv interior Lagrange extension ------------------ #
    pint2, d2c, m02c, bubsv = _hdiv_interior_stage(
        lvl.m02[jcc], lvl.m03[jcc], lvl.d2[jcc], ptr3, ptr2[jcfaces],
        lvl.t2[jufaces], fslot)

    nc, nf, ne, nv = grid_counts(cshape)
    coarse = StructuredLevel(shape=cshape)
    coarse.m03, coarse.m12, coarse.m02 = m03c, m12c, m02c
    coarse.d2 = d2c
    coarse.pv2 = jnp.ones(sum(nf), dtype=dt)
    coarse.t3, coarse.t2 = t3c, t2c

    out = DarcyLevelOut(
        cshape=cshape, ptr3=ptr3, f3=f3, ptr2=ptr2, f2=f2,
        pint2=pint2, d2c=d2c, cc=cc, cf=cf, cfaces=cfaces,
        ufaces=ufaces,
        max_rel_sv=float(jnp.maximum(sv3, sv2)),
        bub_sv=float(bubsv))
    eff_tol = max(svd_tol, 50.0 * float(np.finfo(
        np.dtype(str(dt).replace("float", "float"))).eps)
        if dt in (jnp.float32,) else svd_tol)
    assert out.max_rel_sv < max(svd_tol, eff_tol), \
        (out.max_rel_sv, "trace SVD kept a mode: structure not static")
    assert out.bub_sv < max(1e2 * svd_tol, eff_tol), \
        (out.bub_sv, "bubble SVD kept a mode: structure not static")
    return coarse, out


def materialize_P_darcy(out: DarcyLevelOut, fshape):
    """Host CSRs (P2, P3) of one structured Darcy coarsening step."""
    import scipy.sparse as sp
    ncf_, nff, nef, nvf = grid_counts(fshape)
    ncc, nfc, nec, nvc = grid_counts(out.cshape)
    ptr3 = np.asarray(out.ptr3)
    rows = out.cc.ravel()
    cols = np.repeat(np.arange(ncc), 8)
    P3 = sp.coo_matrix((ptr3.ravel(), (rows, cols)),
                       shape=(ncf_, ncc)).tocsr()
    ptr2 = np.asarray(out.ptr2)
    pint2 = np.asarray(out.pint2)
    rows = np.concatenate([out.cf.ravel(),
                           np.repeat(out.ufaces[:, :12].ravel(), 6)])
    cols = np.concatenate([
        np.repeat(np.arange(sum(nfc)), 4),
        np.tile(out.cfaces, (1, 12)).reshape(-1)])
    vals = np.concatenate([ptr2.ravel(), pint2.ravel()])
    P2 = sp.coo_matrix((vals, (rows, cols)),
                       shape=(sum(nff), sum(nfc))).tocsr()
    return P2, P3
