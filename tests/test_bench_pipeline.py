"""Regression test for the benchmark's multi-level build pipeline.

Round-2 shipped no perf number because bench.py passed the coarse GRID
SHAPE to cartesian_partition, whose second argument is per-axis
coarsening FACTORS — the second coarsening then fed a fine-length
partition vector into an 8-element topology and crashed
(BENCH_r02.json rc=1).  This test runs the exact _build_h1 shape logic
at a small nx with >= 2 coarsenings so that mistake can never silently
return, and pins the input-validation error message that would have
caught it in seconds.
"""

import numpy as np
import pytest


def test_build_h1_two_coarsenings():
    import bench
    seqs, A, b = bench._build_h1(8, min_coarse=8)
    # 8 -> 4 -> 2 element grid: three sequence levels.
    assert len(seqs) == 3
    ndofs = [s.dof[0].ndofs for s in seqs]
    assert ndofs[0] == 9 ** 3
    assert ndofs[0] > ndofs[1] > ndofs[2]
    assert A.shape == (ndofs[0], ndofs[0])
    # System is solvable and SPD after BC elimination.
    x = np.linalg.solve(A.toarray(), b)
    assert np.linalg.norm(A @ x - b) < 1e-8 * max(np.linalg.norm(b), 1.0)


def test_cartesian_partition_is_factors_not_shape():
    from parelag_tpu.partitioning.partitioners import cartesian_partition
    part = cartesian_partition((8, 8, 8), (2, 2, 2))
    assert part.size == 512
    assert part.max() + 1 == 4 ** 3
    # first 2x2x2 block maps to agglomerate 0
    assert part[0] == part[1] == part[8] == part[9] == 0
    assert part[64] == part[65] == 0          # z-neighbor layer
    assert part[2] == 1                       # next block in x


def test_coarsen_rejects_wrong_length_partition():
    from parelag_tpu.mesh.mesh import hex_grid_mesh
    from parelag_tpu.topology.topology import AgglomeratedTopology
    from parelag_tpu.partitioning.partitioners import cartesian_partition

    mesh = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(mesh)
    coarse = topo.coarsen_local_partitioning(
        cartesian_partition((4, 4, 4), (2, 2, 2)))
    # Feeding the FINE partition to the COARSE level must fail loudly.
    with pytest.raises(ValueError, match="partition vector"):
        coarse.coarsen_local_partitioning(
            cartesian_partition((4, 4, 4), (2, 2, 2)))


def test_forced_device_backend_matches_host_digits():
    """solve_backend='device' is the transfer-minimal mixed-precision
    path (equilibration + f32 Newton-Schulz + on-device refinement):
    accuracy contract is the f32 refinement floor, NOT LAPACK-grade —
    the coarse spaces must match the host run's dimensions and agree to
    f32 accuracy, and no system may solve to garbage (the original
    'Singular matrix' regression: a plain f32 downcast destroyed the
    ill-conditioned extension saddles and the cochain Gram)."""
    import scipy.sparse as sp
    from parelag_tpu.mesh.mesh import hex_grid_mesh
    from parelag_tpu.topology.topology import AgglomeratedTopology
    from parelag_tpu.amge.fespace import DeRhamSequenceFE
    from parelag_tpu.partitioning.partitioners import cartesian_partition

    def run(backend):
        mesh = hex_grid_mesh(4, 4, 4)
        topo = AgglomeratedTopology.from_mesh(mesh)
        topo.coarsen_local_partitioning(
            cartesian_partition((4, 4, 4), (2, 2, 2)))
        seq = DeRhamSequenceFE(topo, mesh)
        seq.set_upscaling_targets(0)
        seq.solve_backend = backend
        seq.coarsen()
        return seq

    sh = run("host")
    sd = run("device")
    for j in range(4):
        assert sh.P[j].shape == sd.P[j].shape, \
            f"form {j}: coarse dimensions diverge"
        d = abs(sp.csr_matrix(sh.P[j]) - sp.csr_matrix(sd.P[j])).max()
        assert d < 5e-5, f"form {j}: device backend off by {d}"


def test_device_solve_refined_ill_conditioned():
    """The refined solver handles condition numbers far beyond f32 on its
    own (refinement) and falls back to lstsq when truly stalled."""
    from parelag_tpu.ops.batched import _device_solve_refined
    rng = np.random.RandomState(0)
    n = 24
    Q, _ = np.linalg.qr(rng.randn(n, n))
    for cond in (1e6, 1e10):
        w = np.logspace(0, -np.log10(cond), n)
        A = (Q * w) @ Q.T
        B = rng.randn(n, 3)
        X = _device_solve_refined(A[None], B[None])[0]
        r = np.abs(A @ X - B).max()
        # LAPACK-grade: no worse than 10x the f64 direct solve's residual
        r_ref = np.abs(A @ np.linalg.solve(A, B) - B).max()
        assert r < 10 * max(r_ref, 1e-13), \
            f"cond {cond}: residual {r} vs LAPACK {r_ref}"
