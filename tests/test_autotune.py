"""Cycle-shape autotuner (solvers/autotune.py): the measured grid picks a
converging configuration and its hierarchy solves the system (reference
role: the XML-exposed cycle/relaxation knobs of ParELAG_Hierarchy.hpp:114
and ParELAG_HypreSmootherFactory.cpp:73-84, chosen by hand there)."""

import numpy as np

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import cartesian_partition
from parelag_tpu.models.upscaling import (
    mark_dofs_on_bndr, eliminate_rowcols)
from parelag_tpu.solvers.amge_solver import build_amge_hierarchy
from parelag_tpu.solvers.autotune import tune_cycle, DEFAULT_GRID


def _problem(nx=8):
    mesh = hex_grid_mesh(nx, nx, nx)
    topo = AgglomeratedTopology.from_mesh(mesh)
    topo.coarsen_local_partitioning(
        cartesian_partition((nx, nx, nx), (2, 2, 2)))
    seq = DeRhamSequenceFE(topo, mesh)
    seq.set_upscaling_targets(0)
    seqs = [seq, seq.coarsen()]
    M = seq.compute_mass_operator(0)
    W = seq.compute_mass_operator(1)
    A = (M + seq.D[0].T @ W @ seq.D[0]).tocsr()
    rng = np.random.RandomState(3)
    b = rng.randn(A.shape[0])
    marker = mark_dofs_on_bndr(seq, 0, {1, 2, 3, 4, 5, 6})
    A, b = eliminate_rowcols(A, b, marker, np.zeros(A.shape[0]))
    _, A_levels, P_levels = build_amge_hierarchy(seqs, 0, A)
    return A, b, A_levels, P_levels


def test_tune_cycle_picks_converging_config():
    A, b, A_levels, P_levels = _problem()
    best, table = tune_cycle(A_levels, P_levels, b, rtol=1e-6,
                             dtype=np.float64, repeats=1)
    assert best is not None
    assert len(table) == len(DEFAULT_GRID)
    assert best["converged"] and best["rel_res"] < 1e-5
    # every converging row reports a positive measured time; best is min
    ok = [r for r in table if r.get("converged")]
    assert all(r["solve_s"] > 0 for r in ok)
    assert best["solve_s"] == min(r["solve_s"] for r in ok)
    # the winner's hierarchy is usable directly
    import jax.numpy as jnp
    H = best["hierarchy"]
    x = np.asarray(H.apply(jnp.asarray(b)))
    assert np.isfinite(x).all()
    # W-cycle rows (mu=2) converge in <= the V-cycle iters of the same
    # smoother (a W cycle is at least as strong per iteration)
    by_cfg = {(r["cfg"]["mu"], r["cfg"]["smoother"],
               r["cfg"].get("sweeps"), r["cfg"].get("degree")): r
              for r in table if r.get("converged")}
    v = by_cfg.get((1, "l1jacobi", 1, None))
    w = by_cfg.get((2, "l1jacobi", 1, None))
    if v and w:
        assert w["iters"] <= v["iters"]
