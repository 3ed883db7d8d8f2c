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
