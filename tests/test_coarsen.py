"""Full de Rham coarsening invariants.

Mirrors the reference's strongest self-checks
(DeRhamSequence::CheckInvariants, DeRhamSequence.cpp:694-970, exercised by
testsuite/coarseSpaces.cpp after every Coarsen):

    Pi P = I,   M_c = P^T M_f P,   D_c = Pi_{j+1} D_f P_j,
    D_c Pi_j = Pi_{j+1} D_f  (commutativity),   D_{j+1} D_j = 0,

plus: the coarse space contains the targets (polynomial reproduction:
P Pi t = t for every target t).
"""

import numpy as np
import pytest

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import refined_mesh_partition


@pytest.fixture(scope="module")
def coarsened():
    m = hex_grid_mesh(2, 2, 2).uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen(svd_tol=1e-9)
    return seq, coarse


def test_invariants(coarsened):
    seq, coarse = coarsened
    errs, bad = seq.check_invariants(tol=1e-8)
    assert not bad, f"invariant violations: {bad} (all: {errs})"


def test_coarse_dof_counts(coarsened):
    seq, coarse = coarsened
    # H1: one dof per coarse vertex + extras; at minimum the 27 vertices
    assert coarse.dof[0].ndofs >= 27
    assert coarse.dof[3].ndofs >= 8
    for j in range(4):
        assert seq.P[j].shape == (seq.dof[j].ndofs, coarse.dof[j].ndofs)


def test_target_reproduction(coarsened):
    """Upscaling guarantee: targets are exactly in the coarse space."""
    seq, coarse = coarsened
    for j in range(4):
        t = seq.targets[j]
        tc = seq.Pi[j].matrix @ t
        back = seq.P[j] @ tc
        err = np.abs(back - t).max()
        assert err < 1e-8, (j, err)


def test_pv_reproduction(coarsened):
    """The constant-1 L2 function is reproduced."""
    seq, coarse = coarsened
    ones = np.ones(seq.dof[3].ndofs)
    back = seq.P[3] @ (seq.Pi[3].matrix @ ones)
    assert np.abs(back - ones).max() < 1e-10


def test_coarse_derivative_exactness(coarsened):
    seq, coarse = coarsened
    from parelag_tpu.ops import csr as C
    assert C.max_abs((coarse.D[1] @ coarse.D[0]).tocsr()) < 1e-9
    assert C.max_abs((coarse.D[2] @ coarse.D[1]).tocsr()) < 1e-9


def test_deformed_mesh_invariants():
    """Curved (non-affine) hexes via the reference's deformation3D map
    (UpscalingGeneralForm.cpp:48-52): all coarsening invariants must hold
    on trilinear geometry too."""
    from parelag_tpu.mesh.mesh import hex_grid_mesh

    def deform(v):
        out = v.copy()
        out[1] = v[1] + 0.5 * np.exp(v[2])
        out[0] = v[0] + np.sin(out[1])
        return out

    m = hex_grid_mesh(2, 2, 2).uniform_refinement()
    m.transform(deform)
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    seq.coarsen(svd_tol=1e-9)
    errs, bad = seq.check_invariants(tol=1e-8)
    assert not bad, bad


def test_timer_and_profiler_utils():
    from parelag_tpu.utils.timing import TimeManager, named_scope
    TimeManager.clear()
    import jax.numpy as jnp
    with TimeManager.add_timer("scoped", sync_device=True):
        with named_scope("inner"):
            (jnp.ones(16) * 2).block_until_ready()
    assert TimeManager.get_timer("scoped").elapsed() > 0


def test_invariants_on_algo2_coarse_facets():
    """The full de Rham coarsening must also hold on the pair-based coarse
    facet topology (coarsefaces_algo=2, reference ComputeCoarseFacets,
    Topology.cpp:455-662; selectable in CoarsenLocalPartitioning,
    Topology.cpp:665-668)."""
    m = hex_grid_mesh(2, 2, 2).uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(refined_mesh_partition(64, 8),
                                    coarsefaces_algo=2)
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    seq.coarsen(svd_tol=1e-9)
    errs, bad = seq.check_invariants(tol=1e-8)
    assert not bad, f"invariant violations: {bad} (all: {errs})"


def test_order1_upscaling_targets():
    """upscalingOrder=1 (reference testsuite/UpscalingGeneralForm.cpp
    --upscalingorder): richer polynomial targets enlarge every coarse space
    while keeping all invariants and exact target reproduction."""
    m = hex_grid_mesh(2, 2, 2).uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(1)
    coarse = seq.coarsen(svd_tol=1e-9)
    errs, bad = seq.check_invariants(tol=1e-7)
    assert not bad, f"invariant violations: {bad} (all: {errs})"
    for j in range(4):
        t = seq.targets[j]
        assert t.shape[1] > 0
        back = seq.P[j] @ (seq.Pi[j].matrix @ t)
        assert np.abs(back - t).max() < 1e-7, j

    # order-1 spaces strictly contain the order-0 ones
    topo0 = AgglomeratedTopology.from_mesh(m)
    topo0.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    seq0 = DeRhamSequenceFE(topo0, m)
    seq0.set_upscaling_targets(0)
    coarse0 = seq0.coarsen(svd_tol=1e-9)
    for j in range(4):
        assert coarse.dof[j].ndofs >= coarse0.dof[j].ndofs
    assert coarse.dof[3].ndofs > coarse0.dof[3].ndofs


def test_f32_setup_pipeline_matches_f64():
    """cast_setup(np.float32) runs the full coarsening engine in f32
    (half the streamed bytes on the host-bound setup path); on a uniform
    grid the coarse-space DIMENSIONS must match the f64 pipeline exactly
    (precision-aware SVD thresholds) and P/D to f32 accuracy."""
    from parelag_tpu.mesh.mesh import hex_grid_mesh
    from parelag_tpu.topology.topology import AgglomeratedTopology
    from parelag_tpu.amge.fespace import DeRhamSequenceFE
    from parelag_tpu.partitioning.partitioners import cartesian_partition

    def build(dtype):
        mesh = hex_grid_mesh(8, 8, 8)
        topo = AgglomeratedTopology.from_mesh(mesh)
        topo.coarsen_local_partitioning(
            cartesian_partition((8, 8, 8), (2, 2, 2)))
        seq = DeRhamSequenceFE(topo, mesh)
        seq.set_upscaling_targets(0)
        if dtype is not None:
            seq.cast_setup(dtype)
        seq.coarsen()
        return seq

    s64 = build(None)
    s32 = build(np.float32)
    for j in range(4):
        assert s32.P[j].dtype == np.float32
        assert s64.P[j].shape == s32.P[j].shape, j
        d = abs(s64.P[j] - s32.P[j].astype(np.float64)).max()
        assert d < 1e-5, (j, d)
    for j in range(3):
        d = abs(s64.coarser.D[j]
                - s32.coarser.D[j].astype(np.float64)).max()
        assert d < 1e-5, (j, d)
