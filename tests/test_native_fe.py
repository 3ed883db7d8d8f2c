"""Native (C++) vs numpy parity for the fine-build kernels: entity
derivation, single-pass hex/face mass assembly, and the split-components
union-find (reference roles: MFEM incidence assembly for Topology.cpp
B-operators, DeRhamSequenceFE::assembleLocalMass DeRhamSequenceFE.cpp:97-310,
and the _split_disconnected fixup)."""

import numpy as np
import pytest

from parelag_tpu.ops import native
from parelag_tpu.mesh.mesh import hex_grid_mesh, read_mesh
from parelag_tpu.mesh import entities as E
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import (
    cartesian_partition, graph_partition)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernels unavailable")

CUBE456 = "/root/reference/meshes/cube456.mesh"


def _numpy_path(fn, *args, **kw):
    """Run fn with the native library masked off (numpy fallback)."""
    avail = native.available
    native.available = lambda: False
    try:
        return fn(*args, **kw)
    finally:
        native.available = avail


def _deformed_hex(nx, seed=0):
    mesh = hex_grid_mesh(nx, nx, nx)
    rng = np.random.default_rng(seed)
    v = mesh.vertices.copy()
    interior = np.all((v > 1e-9) & (v < 1 - 1e-9), axis=1)
    v[interior] += 0.04 * rng.standard_normal(v[interior].shape)
    mesh.vertices = v
    return mesh


@pytest.mark.parametrize("mesh_fn", [
    lambda: hex_grid_mesh(6, 5, 4),
    lambda: _deformed_hex(5),
    lambda: read_mesh(CUBE456),
])
def test_derive_entities_parity(mesh_fn):
    mesh = mesh_fn()
    en = E.derive_entities(mesh)
    ep = _numpy_path(E.derive_entities, mesh)
    for name in ("edges", "elem_edge", "elem_edge_sign", "face_verts",
                 "face_sorted", "elem_face", "elem_face_sign", "face_edge",
                 "face_edge_sign"):
        assert np.array_equal(getattr(en, name), getattr(ep, name)), name
    for a, b in ((en.B0, ep.B0), (en.B1, ep.B1), (en.B2, ep.B2)):
        assert (a != b).nnz == 0
    assert abs(en.B0 @ en.B1).nnz == 0
    assert abs(en.B1 @ en.B2).nnz == 0


def test_hex_masses_parity():
    mesh = _deformed_hex(5, seed=3)
    topo = AgglomeratedTopology.from_mesh(mesh)
    seq_n = DeRhamSequenceFE(topo, mesh)
    seq_p = _numpy_path(
        DeRhamSequenceFE, AgglomeratedTopology.from_mesh(mesh), mesh)
    for key in seq_p.M:
        dn, on, bn, _ = seq_n.M[key]._cat
        dp, op, bp, _ = seq_p.M[key]._cat
        assert np.array_equal(dn, dp) and np.array_equal(on, op)
        scale = max(1.0, np.abs(bp).max())
        assert np.abs(bn - bp).max() < 1e-13 * scale, key
    assert np.abs(seq_n.element_volumes()
                  - seq_p.element_volumes()).max() < 1e-13
    assert abs(seq_n.D[2] - seq_p.D[2]).max() < 1e-12


def test_hex_masses_coefficient_parity():
    mesh = _deformed_hex(4, seed=5)

    def build():
        topo = AgglomeratedTopology.from_mesh(mesh)
        s = DeRhamSequenceFE(topo, mesh)
        s.replace_mass_integrator(
            2, lambda p: 1.0 + p[..., 0] * p[..., 1])
        s.replace_mass_integrator(3, lambda p: 2.0 + p[..., 2])
        return s

    seq_n = build()
    seq_p = _numpy_path(build)
    for key in ((0, 0), (0, 2), (0, 3)):
        bn = seq_n.M[key]._cat[2]
        bp = seq_p.M[key]._cat[2]
        assert np.abs(bn - bp).max() < 1e-13 * max(1.0, np.abs(bp).max())


@pytest.mark.parametrize("structured", [True, False])
def test_coarsening_parity_with_native_split(structured):
    nx = 8
    mesh = hex_grid_mesh(nx, nx, nx)
    topo_n = AgglomeratedTopology.from_mesh(mesh)
    part = (cartesian_partition((nx, nx, nx), (2, 2, 2)) if structured
            else graph_partition(topo_n.local_element_element(), 24))
    c_n = topo_n.coarsen_local_partitioning(part)

    topo_p = AgglomeratedTopology.from_mesh(mesh)
    c_p = _numpy_path(topo_p.coarsen_local_partitioning, part)
    for i in range(3):
        assert (c_n.B[i] != c_p.B[i]).nnz == 0
    for i in range(4):
        assert (topo_n.AEntity_entity[i]
                != topo_p.AEntity_entity[i]).nnz == 0


def test_f32_direct_masses():
    """DeRhamSequenceFE(dtype=np.float32) stores every mass slot in f32,
    matching the f64 build to f32 roundoff (native kernels accumulate in
    f64 and cast only at store; the fallback numpy path downcasts on
    assignment). vols/derivatives stay f64."""
    mesh = _deformed_hex(4, seed=7)
    topo = AgglomeratedTopology.from_mesh(mesh)
    s64 = DeRhamSequenceFE(topo, mesh)
    s32 = DeRhamSequenceFE(AgglomeratedTopology.from_mesh(mesh), mesh,
                           dtype=np.float32)
    p32 = _numpy_path(DeRhamSequenceFE,
                      AgglomeratedTopology.from_mesh(mesh), mesh,
                      dtype=np.float32)
    for key in s64.M:
        b64 = s64.M[key]._cat[2]
        for s in (s32, p32):
            b32 = s.M[key]._cat[2]
            assert b32.dtype == np.float32, key
            scale = max(1.0, np.abs(b64).max())
            assert np.abs(b64 - b32).max() < 2e-7 * scale, key
    assert s32.element_volumes().dtype == np.float64
    # cast_setup(np.float32) on an f32-direct build is then a cheap no-op
    # for the mass slots (dtype already matches)
    ids = [id(s32.M[k]._cat[2]) for k in s32.M]
    s32.cast_setup(np.float32)
    assert [id(s32.M[k]._cat[2]) for k in s32.M] == ids


def test_ext_gram_blocks_matches_numpy():
    """The fused native gram kernel reproduces the numpy reference
    sym(B^T M B) on the extension stage's structured basis, including a
    deliberately asymmetric M (the kernel must symmetrize M, matching
    numpy's (C + C^T)/2 post-pass)."""
    from parelag_tpu.ops import native
    if not native.available():
        import pytest
        pytest.skip("native kernels unavailable")
    rng = np.random.RandomState(3)
    for dt, tol in ((np.float64, 1e-12), (np.float32, 2e-5)):
        m, nu_all, nu, k_ext, n_rt, nn = 7, 9, 3, 4, 2, 2
        nb, nsys, kx = nu_all - nu, 8, 4 + 2 + 3   # K > used columns
        Mst = (rng.randn(m, nu_all, nu_all) + 0.01).astype(dt)
        Pbst = rng.randn(m, nb, k_ext).astype(dt)
        Xst = rng.randn(m, nsys, kx).astype(dt)
        UNst = rng.randn(m, nu, 5).astype(dt)      # ldun=5 > nn
        sel = np.array([1, 3, 4, 6], dtype=np.int64)
        nloc = k_ext + n_rt + nn
        out_pos = np.arange(sel.size, dtype=np.int64) * nloc * nloc
        out = np.zeros(sel.size * nloc * nloc, dtype=dt)
        native.ext_gram_blocks(Mst, Pbst, Xst, UNst, nu, k_ext, n_rt,
                               nn, sel, out_pos, out)
        for t, i in enumerate(sel):
            B = np.zeros((nu_all, nloc))
            B[:nu, :k_ext] = Xst[i, :nu, :k_ext]
            B[nu:, :k_ext] = Pbst[i]
            B[:nu, k_ext:k_ext + n_rt] = Xst[i, :nu, k_ext:k_ext + n_rt]
            B[:nu, k_ext + n_rt:] = UNst[i, :, :nn]
            C = B.T @ (Mst[i].astype(np.float64) @ B)
            C = 0.5 * (C + C.T)
            got = out[out_pos[t]:out_pos[t] + nloc * nloc].reshape(
                nloc, nloc)
            assert np.abs(got - C).max() < tol * max(np.abs(C).max(), 1.0)
            assert np.array_equal(got, got.T)


def test_extract_blocks_cat_multi_matches_merged():
    """Piece-wise extraction over row-disjoint full-height CSR pieces
    equals extraction from their merged sum (the P-snapshot contract),
    including pieces with different (growing) column counts."""
    import scipy.sparse as sp
    from parelag_tpu.ops import csr as C
    rng = np.random.RandomState(5)
    n, pieces, csrs = 40, [(0, 14, 8), (14, 30, 12), (30, 40, 12)], []
    for r0, r1, nc in pieces:
        rows = np.repeat(np.arange(r0, r1), 3)
        cols = rng.randint(0, nc, rows.size)
        vals = rng.randn(rows.size)
        A = sp.csr_matrix(
            sp.coo_matrix((vals, (rows, cols)), shape=(n, nc)))
        A.sum_duplicates()
        csrs.append(A)
    ncols = 12
    merged = sum(sp.csr_matrix((A.data, A.indices, A.indptr),
                               shape=(n, ncols)) for A in csrs[1:])
    merged = merged + sp.csr_matrix(
        (csrs[0].data, csrs[0].indices, csrs[0].indptr), shape=(n, ncols))
    rows_cat = np.array([1, 5, 17, 33, 2, 38, 20], dtype=np.int64)
    row_off = np.array([0, 4, 7], dtype=np.int64)
    cols_cat = np.array([0, 3, 7, 11, 2, 5], dtype=np.int64)
    col_off = np.array([0, 4, 6], dtype=np.int64)
    got = C.extract_blocks_cat_multi(csrs, rows_cat, row_off,
                                     cols_cat, col_off)
    ref = C.extract_blocks_cat(merged.tocsr(), rows_cat, row_off,
                               cols_cat, col_off)
    for b in range(2):
        assert np.abs(got[b] - ref[b]).max() < 1e-14


def test_wd_blocks_matches_dense():
    """wd_blocks reproduces W[:n_pint, :] @ Dloc computed via dense
    extraction, for ragged AE families and i32/i64 x f32/f64 CSRs."""
    import scipy.sparse as sp
    from parelag_tpu.ops import csr as C, native
    from parelag_tpu.ops.ragged import BlockList
    if not native.available():
        import pytest
        pytest.skip("native kernels unavailable")
    rng = np.random.RandomState(11)
    npf, nuf = 60, 45                     # fine p/u dof counts
    D = sp.random(npf, nuf, density=0.08, random_state=rng,
                  format="csr")
    fams = [((0, 8), (0, 10), 3), ((8, 14), (10, 22), 4),
            ((14, 26), (22, 30), 5)]      # (p range, u range, n_pint)
    p_cat = np.concatenate([np.arange(a, b) for (a, b), _, _ in fams])
    p_off = np.cumsum([0] + [b - a for (a, b), _, _ in fams])
    u_cat = np.concatenate([np.arange(a, b) for _, (a, b), _ in fams])
    u_off = np.cumsum([0] + [b - a for _, (a, b), _ in fams])
    n_pint = np.array([k for _, _, k in fams], dtype=np.int64)
    for vdt, idt, tol in ((np.float64, np.int64, 1e-13),
                          (np.float32, np.int32, 1e-5)):
        Dx = D.astype(vdt)
        Dx.indptr = Dx.indptr.astype(idt)
        Dx.indices = Dx.indices.astype(idt)
        Wb = [rng.randn(b - a, b - a).astype(vdt)
              for (a, b), _, _ in fams]
        Wd = BlockList.from_list(Wb)
        pos = C._col_scratch(nuf)
        got = native.wd_blocks(Dx, p_cat, p_off, u_cat, u_off, n_pint,
                               Wd, pos)
        for i, ((pa, pb), (ua, ub), k) in enumerate(fams):
            Dloc = Dx[pa:pb, ua:ub].toarray()
            ref = Wb[i][:k, :] @ Dloc
            assert np.abs(got[i] - ref).max() <= tol * max(
                1.0, np.abs(ref).max()), (vdt, i)
        assert (pos == -1).all() or pos.size > nuf


def test_full_coarsen_native_vs_numpy_parity():
    """End-to-end coarsen equivalence: the native fast paths (lazy block
    builder + incremental snapshot, piece-wise extraction, wd_blocks,
    ext_gram, batched LU) against the pure-numpy fallbacks on a deformed
    hex mesh with an irregular partition. P, coarse D and the coarse
    mass blocks must agree to f64 roundoff-accumulation tolerance."""
    from parelag_tpu.partitioning.partitioners import graph_partition
    if not native.available():
        import pytest
        pytest.skip("native kernels unavailable")

    def build():
        mesh = _deformed_hex(6, seed=2)
        topo = AgglomeratedTopology.from_mesh(mesh)
        part = graph_partition(topo.local_element_element(), 11, seed=4)
        topo.coarsen_local_partitioning(part)
        seq = DeRhamSequenceFE(topo, mesh)
        seq.set_upscaling_targets(0)
        return seq, seq.coarsen()

    seq_n, coarse_n = build()
    seq_p, coarse_p = _numpy_path(build)
    for j in range(4):
        Pn, Pp = seq_n.P[j], seq_p.P[j]
        assert Pn.shape == Pp.shape, j
        d = abs(Pn - Pp)
        assert d.nnz == 0 or d.max() < 5e-11, (j, d.max())
        if j < len(coarse_n.D) and coarse_n.D[j] is not None:
            dd = abs(coarse_n.D[j] - coarse_p.D[j])
            assert dd.nnz == 0 or dd.max() < 5e-11, (j, dd.max())
    for key in coarse_n.M:
        a = coarse_n.M[key].concatenated()[2]
        b = coarse_p.M[key].concatenated()[2]
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() < 5e-11 * scale, key
