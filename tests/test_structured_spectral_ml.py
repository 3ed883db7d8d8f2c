"""Multilevel block spectral engine (amge/structured_spectral_ml.py)
contracts:

1. Level-1 degeneracy: with CapF=CapP=1, CapI=0 the block stages must
   reduce EXACTLY to the one-step engine's math — machine-digit parity
   of coarse dimensions and Darcy upscaling error in f64.
2. Recursion quality: a 2-level chain to a given coarse grid must be at
   least as good as the ONE-SHOT spectral coarsening to the same grid
   (recursion re-solves local problems on the coarse operators and
   keeps a superset-quality space; the reference's recursive Coarsen()
   with per-level spectral targets is the flow being mirrored,
   /root/reference/src/amge/DeRhamSequence.cpp:572-692,
   examples/MultigridTestSPE10.cpp:169-187).
3. The device execution model (f32 + Newton-Schulz/Schur stage solves,
   structured.solve_mode("ns")) reproduces the f32 direct chain within
   the documented f32 band.
"""

import numpy as np
import pytest

from parelag_tpu.amge import structured as st
from parelag_tpu.amge import structured_spectral as sps
from parelag_tpu.amge import structured_spectral_ml as ml

from test_structured_spectral import (_coeff_field, _darcy_upscale_err,
                                      _structured_ops)


@pytest.mark.parametrize("shape,f,max_evects",
                         [((8, 8, 4), (2, 2, 2), 2),
                          ((8, 8, 4), (4, 4, 2), 5),
                          ((8, 4, 4), (4, 4, 4), 3),
                          ((8, 8, 4), (2, 2, 2), 3)])
def test_block_level1_degenerate_parity(shape, f, max_evects):
    """One block coarsening of the degenerate fine level == the
    one-step engine, to machine digits (same numbering by
    construction: facet dofs by facet, then cell interiors)."""
    coeff = _coeff_field(shape, seed=3)
    out1 = sps.spectral_coarsen_darcy(shape, f, coeff, spect_tol=0.002,
                                      max_evects=max_evects)
    lvl0 = ml.fine_block_level(shape, coeff)
    outb = ml.coarsen_block_level(lvl0, f, spect_tol=0.002,
                                  max_evects=max_evects)
    assert outb.P2.shape == out1.P2.shape
    assert outb.P3.shape == out1.P3.shape
    nxt = outb.next_level
    assert (nxt.facet_n == np.asarray(out1.n_facet_dofs)).all()
    assert (nxt.cell_pn == np.asarray(out1.n_ae_p_dofs)).all()
    assert (nxt.cell_rt_n + nxt.cell_null_n
            == np.asarray(out1.n_ae_u_dofs)).all()
    M2, W, D2 = _structured_ops(shape, coeff)
    e1 = _darcy_upscale_err(M2, W, D2, out1.P2, out1.P3)
    eb = _darcy_upscale_err(M2, W, D2, outb.P2, outb.P3)
    assert abs(e1 - eb) < 1e-10 + 1e-8 * e1, (e1, eb)


@pytest.mark.parametrize("shape,f_oneshot,facs,max_evects",
                         [((8, 8, 8), (4, 4, 4), [(2, 2, 2), (2, 2, 2)], 5),
                          ((8, 8, 4), (4, 4, 2), [(2, 2, 2), (2, 2, 1)], 5)])
def test_block_two_level_vs_oneshot(shape, f_oneshot, facs, max_evects):
    """A 2-level recursive chain to coarse grid G is at least as
    accurate as the single-shot spectral coarsening to G (it re-solves
    the local spectral problems on the level-1 coarse operators, which
    RESOLVES the level-1 space instead of cutting through it)."""
    coeff = _coeff_field(shape, seed=3)
    M2, W, D2 = _structured_ops(shape, coeff)
    out1 = sps.spectral_coarsen_darcy(shape, f_oneshot, coeff,
                                      spect_tol=0.002,
                                      max_evects=max_evects)
    e1 = _darcy_upscale_err(M2, W, D2, out1.P2, out1.P3)
    levels, outs = ml.spectral_coarsen_darcy_chain(
        shape, facs, coeff, spect_tol=0.002, max_evects=max_evects)
    assert len(outs) == 2 and len(levels) == 3
    assert levels[2].cshape == tuple(
        s // fa // fb for s, fa, fb in zip(shape, facs[0], facs[1]))
    Pu = outs[0].P2 @ outs[1].P2
    Pp = outs[0].P3 @ outs[1].P3
    eb = _darcy_upscale_err(M2, W, D2, Pu, Pp)
    # measured: 0.843 vs 0.937 and 0.744 vs 0.853 — the chain wins;
    # the contract leaves a 5% band so a borderline kept mode cannot
    # flip the test
    assert eb < 1.05 * e1, (eb, e1)
    # every P column is a real dof (no zero columns from mask slips)
    for P in (outs[0].P2, outs[1].P2, outs[0].P3, outs[1].P3):
        col_norms = np.sqrt(np.asarray(
            P.multiply(P).sum(axis=0)).ravel())
        assert (col_norms > 1e-12).all()


def test_block_chain_parity_vs_generic_recursion():
    """THE reference oracle: the generic engine's recursive Coarsen()
    with per-level spectral targets (the spe10_darcy loop,
    DeRhamSequence.cpp:572-692) on the same cartesian partitions must
    produce the same coarse dimensions and the same Darcy upscaling
    error to digits.  Each engine's error is evaluated against its own
    fine operators (the functional is numbering-free)."""
    import scipy.sparse as sp
    from parelag_tpu.mesh.mesh import hex_grid_mesh
    from parelag_tpu.topology.topology import AgglomeratedTopology
    from parelag_tpu.amge.fespace import DeRhamSequenceFE
    from parelag_tpu.amge.spectral import (
        compute_local_hdiv_l2_spectral_targets)
    from parelag_tpu.partitioning.partitioners import cartesian_partition

    shape, facs, me, tol = (8, 8, 8), [(2, 2, 2), (2, 2, 2)], 5, 0.002
    coeff = _coeff_field(shape, seed=3)

    # generic recursive chain (topology levels FIRST, then the
    # sequence recursion — the spe10_darcy construction order)
    mesh = hex_grid_mesh(*shape)
    topos = [AgglomeratedTopology.from_mesh(mesh)]
    cur = shape
    for f in facs:
        topos.append(topos[-1].coarsen_local_partitioning(
            cartesian_partition(cur, f)))
        cur = tuple(s // ff for s, ff in zip(cur, f))
    seq0 = DeRhamSequenceFE(topos[0], mesh)
    seq0.jform_start = 2
    cgrid = np.asarray(coeff).reshape(
        shape[2], shape[1], shape[0]).transpose(2, 1, 0)

    def kinv(p):
        i = np.clip((p[..., 0] * shape[0]).astype(int), 0, shape[0] - 1)
        j = np.clip((p[..., 1] * shape[1]).astype(int), 0, shape[1] - 1)
        k = np.clip((p[..., 2] * shape[2]).astype(int), 0, shape[2] - 1)
        return cgrid[i, j, k]

    seq0.replace_mass_integrator(2, kinv)
    seq0.set_upscaling_targets(0)
    seqs = [seq0]
    for _ in facs:
        s = seqs[-1]
        s.agglomerate_dofs()
        tr, l2 = compute_local_hdiv_l2_spectral_targets(s, tol, me)
        s.set_local_targets(1, 2, tr)
        s.set_local_targets(0, 3, l2)
        seqs.append(s.coarsen())
    M2g = seqs[0].compute_mass_operator(2)
    Wg = seqs[0].compute_mass_operator(3)
    D2g = seqs[0].D[2].tocsr()
    Pu_g = sp.csr_matrix(seqs[0].P[2]) @ sp.csr_matrix(seqs[1].P[2])
    Pp_g = sp.csr_matrix(seqs[0].P[3]) @ sp.csr_matrix(seqs[1].P[3])
    e_g = _darcy_upscale_err(M2g, Wg, D2g, Pu_g, Pp_g)

    levels, outs = ml.spectral_coarsen_darcy_chain(
        shape, facs, coeff, spect_tol=tol, max_evects=me)
    Pu_b = outs[0].P2 @ outs[1].P2
    Pp_b = outs[0].P3 @ outs[1].P3
    M2, W, D2 = _structured_ops(shape, coeff)
    e_b = _darcy_upscale_err(M2, W, D2, Pu_b, Pp_b)

    assert Pu_b.shape[1] == Pu_g.shape[1], (Pu_b.shape, Pu_g.shape)
    assert Pp_b.shape[1] == Pp_g.shape[1], (Pp_b.shape, Pp_g.shape)
    # measured 9.3656848e-01 both
    assert abs(e_b - e_g) < 1e-8 + 1e-6 * e_g, (e_b, e_g)


def test_block_three_level_chain():
    """3-level recursion: shapes/capacities thread through, per-level
    prolongations compose, error grows monotonically but stays bounded
    and each level's quality guard (ns_res) holds."""
    shape = (8, 8, 8)
    facs = [(2, 2, 2), (2, 2, 2), (2, 2, 2)]
    coeff = _coeff_field(shape, seed=5, sigma=1.5)
    M2, W, D2 = _structured_ops(shape, coeff)
    levels, outs = ml.spectral_coarsen_darcy_chain(
        shape, facs, coeff, spect_tol=0.002, max_evects=4)
    assert levels[3].cshape == (1, 1, 1)
    errs = []
    Pu, Pp = outs[0].P2, outs[0].P3
    errs.append(_darcy_upscale_err(M2, W, D2, Pu, Pp))
    for o in outs[1:]:
        Pu, Pp = Pu @ o.P2, Pp @ o.P3
        errs.append(_darcy_upscale_err(M2, W, D2, Pu, Pp))
    assert errs[0] <= errs[1] + 1e-8 <= errs[2] + 2e-8, errs
    # the (1,1,1) endpoint retains almost nothing (measured 1.63) — the
    # real quality contract is test_block_two_level_vs_oneshot; this
    # bound only catches a blow-up
    assert errs[2] < 2.0, errs
    # prolongation chain dimensions are consistent with the level
    # numberings
    for lvl, o in zip(levels, outs):
        _, _, nu = lvl.u_offsets()
        _, npp = lvl.p_offsets()
        assert o.P2.shape[0] == nu
        assert o.P3.shape[0] == npp


def test_block_chain_ns_mode_matches_direct():
    """The device production path (f32, NS mass inverses + Schur
    bordered solves) reproduces the f32 direct chain: same band as the
    one-step engine's ns test (borderline keep flips allowed in f32)."""
    shape, facs = (8, 8, 4), [(2, 2, 2), (2, 2, 1)]
    coeff = _coeff_field(shape, seed=3).astype(np.float32)
    M2, W, D2 = _structured_ops(shape, coeff)

    def chain_err(mode):
        if mode is None:
            levels, outs = ml.spectral_coarsen_darcy_chain(
                shape, facs, coeff, spect_tol=0.002, max_evects=4,
                dtype=np.float32)
        else:
            with st.solve_mode(mode):
                levels, outs = ml.spectral_coarsen_darcy_chain(
                    shape, facs, coeff, spect_tol=0.002, max_evects=4,
                    dtype=np.float32)
        Pu = (outs[0].P2 @ outs[1].P2).astype(np.float64)
        Pp = (outs[0].P3 @ outs[1].P3).astype(np.float64)
        return (_darcy_upscale_err(M2, W, D2, Pu, Pp),
                max(o.ns_res for o in outs))

    e_d, _ = chain_err(None)
    e_n, ns_res = chain_err("ns")
    assert ns_res < 5e-4, ns_res
    # measured 8% drift (1.023 vs 1.114): level-2 inputs differ at the
    # f32 floor, so borderline keep decisions compound across levels —
    # wider than the one-step engine's 1% band by design
    assert abs(e_n - e_d) < 5e-3 + 1.5e-1 * e_d, (e_n, e_d)
