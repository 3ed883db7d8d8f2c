"""Checkpoint/resume of setup products (aux subsystem, SURVEY §5; the
reference has none — every run repeats setup)."""

import numpy as np
import jax.numpy as jnp

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import refined_mesh_partition
from parelag_tpu.models.upscaling import (
    mark_dofs_on_bndr, boundary_rhs, eliminate_rowcols)
from parelag_tpu.solvers.amge_solver import build_amge_hierarchy
from parelag_tpu.utils.checkpoint import (
    save_pytree, load_pytree, save_transfers, load_transfers)


def _setup():
    m = hex_grid_mesh(2, 2, 2).uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    seq.coarsen()
    M = seq.compute_mass_operator(0)
    W = seq.compute_mass_operator(1)
    A = (M + seq.D[0].T @ W @ seq.D[0]).tocsr()
    b = boundary_rhs(seq, 0, {1: -1.0})
    marker = mark_dofs_on_bndr(seq, 0, {2, 3, 4, 5})
    A, b = eliminate_rowcols(A, b, marker, np.zeros(A.shape[0]))
    return seq, A, b


def test_hierarchy_roundtrip(tmp_path):
    seq, A, b = _setup()
    H, _, _ = build_amge_hierarchy([seq, seq.coarser], 0, A,
                                   smoother="l1jacobi")
    p = tmp_path / "hier.npz"
    save_pytree(H, str(p))
    H2 = load_pytree(str(p))
    bj = jnp.asarray(b)
    z1 = np.asarray(H.apply(bj))
    z2 = np.asarray(H2.apply(bj))
    assert np.abs(z1 - z2).max() == 0.0
    assert H2.levels[0].pre.sweeps == H.levels[0].pre.sweeps


def test_transfers_roundtrip(tmp_path):
    seq, A, b = _setup()
    p = tmp_path / "transfers.npz"
    save_transfers([seq], str(p))
    back = load_transfers(str(p))
    assert len(back) == 1
    for j in range(4):
        assert np.abs(back[0]["P"][j] - seq.P[j]).max() == 0.0
        assert np.abs(back[0]["Pi"][j] - seq.Pi[j].matrix).max() == 0.0
    for j in range(3):
        assert np.abs(back[0]["D"][j] - seq.D[j]).max() == 0.0
    # a resumed solve using only checkpointed transfers
    from parelag_tpu.solvers.hierarchy import build_hierarchy, rap
    from parelag_tpu.solvers.smoothers import make_l1_jacobi
    from parelag_tpu.solvers.cg import pcg
    import jax
    P0 = back[0]["P"][0]
    H = build_hierarchy([A, rap(A, P0)], [P0],
                        lambda AA, l: make_l1_jacobi(AA, sweeps=2))
    x, info = jax.jit(lambda Ha, bb: pcg(
        lambda v: Ha.levels[0].A @ v, bb, precond=Ha.apply, rtol=1e-10)
    )(H, jnp.asarray(b))
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-7
