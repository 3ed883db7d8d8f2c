"""GhostMap (GhostMap.hpp:51), CoarsenMetisMaterialId
(CoarsenMetisMaterialId.hpp:39), and the MLHiptmairSolver template
(ParELAG_MLHiptmairSolver.hpp:34-130)."""

import numpy as np
import pytest

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.parallel.ghost import GhostMap
from parelag_tpu.partitioning.partitioners import (
    cartesian_partition, metis_material_partition)

R = 4


def _facet_case():
    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    rank_of_elem = cartesian_partition((4, 4, 4), (2, 2, 4))
    B0 = topo.B[0].tocsr()
    nf = B0.shape[1]
    owner = np.full(nf, R, dtype=np.int64)
    coo = B0.tocoo()
    np.minimum.at(owner, coo.col, rank_of_elem[coo.row])
    reads = [np.unique(B0[rank_of_elem == r].indices) for r in range(R)]
    return topo, owner, reads


def test_ghost_distribute_assemble_host():
    topo, owner, reads = _facet_case()
    gm = GhostMap.build(owner, reads)
    nf = owner.size
    rng = np.random.RandomState(0)
    vals = rng.randn(nf)

    # distribute: every rank's ghost copy equals the owner value
    copies = gm.distribute(vals)
    for r, (g, c) in enumerate(zip(gm.ghosts, copies)):
        assert np.array_equal(c, vals[g])
        assert np.all(owner[g] != r)

    # assemble: sum of per-rank contributions lands on the owner
    contribs = [rng.randn(g.size) for g in gm.ghosts]
    out = gm.assemble(vals, contribs)
    ref = vals.copy()
    for g, c in zip(gm.ghosts, contribs):
        np.add.at(ref, g, c)
    assert np.allclose(out, ref)


def test_ghost_device_matches_host():
    import jax.numpy as jnp
    from parelag_tpu.parallel.sharding import make_dd_mesh
    topo, owner, reads = _facet_case()
    gm = GhostMap.build(owner, reads)
    mesh = make_dd_mesh(R)
    gvirt, dist_fn, asm_fn = gm.device_fns(mesh)
    rng = np.random.RandomState(1)
    vals = rng.randn(owner.size)
    blocks = jnp.asarray(gm.to_blocks(vals))

    ghost_dev = np.asarray(dist_fn(blocks, gvirt))
    for r, g in enumerate(gm.ghosts):
        assert np.allclose(ghost_dev[r, :g.size], vals[g])

    m_g = ghost_dev.shape[1]
    contribs = [rng.randn(g.size) for g in gm.ghosts]
    cpad = np.zeros((R, m_g))
    for r, c in enumerate(contribs):
        cpad[r, :c.size] = c
    out_dev = np.asarray(asm_fn(blocks, jnp.asarray(cpad), gvirt))
    ref = gm.assemble(vals, contribs)
    assert np.allclose(gm.from_blocks(out_dev), ref)


def test_metis_material_partition_respects_interfaces():
    m = hex_grid_mesh(8, 8, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    A = topo.local_element_element()
    # two materials: x < 1/2 and x >= 1/2
    cx = m.vertices[m.elements].mean(axis=1)[:, 0]
    mat = (cx > 0.5).astype(np.int64) + 1
    part = metis_material_partition(A, mat, 8, seed=0)
    # no agglomerate crosses the material interface
    for p in np.unique(part):
        assert np.unique(mat[part == p]).size == 1
    # part count near target, sizes balanced
    n_parts = int(part.max()) + 1
    assert 6 <= n_parts <= 10
    sizes = np.bincount(part)
    assert sizes.max() <= 2.0 * m.num_elements / 8
    # flows through topology coarsening with interfaces preserved
    topo.coarsen_local_partitioning(
        part, preserve_material_interfaces=True)
    AE = topo.AEntity_entity[0].tocsr()
    for i in range(AE.shape[0]):
        mem = AE.indices[AE.indptr[i]:AE.indptr[i + 1]]
        assert np.unique(mat[mem]).size == 1


def test_ml_hiptmair_template_hdiv():
    """form=2 instance: Hdiv MG with Hiptmair smoothing at every level
    converges with level-count-robust iterations."""
    import scipy.sparse as sp
    from parelag_tpu.amge.fespace import DeRhamSequenceFE
    from parelag_tpu.partitioning.partitioners import (
        refined_mesh_partition)
    from parelag_tpu.solvers.amge_solver import (
        build_ml_hiptmair, amge_pcg_solve)
    from parelag_tpu.models.upscaling import (
        mark_dofs_on_bndr, eliminate_rowcols)

    m = hex_grid_mesh(2, 2, 2)
    for _ in range(2):
        m = m.uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    t = topo
    for _ in range(2):
        ne = t.num_entities(0)
        t.coarsen_local_partitioning(refined_mesh_partition(ne, ne // 8))
        t = t.coarser
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    seqs = [seq, seq.coarsen()]
    seqs.append(seqs[-1].coarsen())

    M = seq.compute_mass_operator(2)
    W = seq.compute_mass_operator(3)
    D = seq.D[2]
    A = (M + D.T @ W @ D).tocsr()
    b = np.random.RandomState(0).randn(A.shape[0])
    marker = mark_dofs_on_bndr(seq, 2, {1, 2, 3, 4, 5, 6})
    A, b = eliminate_rowcols(A, b, marker, np.zeros(A.shape[0]))

    iters = {}
    for n_lev in (2, 3):
        H, A_l, P_l = build_ml_hiptmair(seqs[:n_lev], 2, A)
        x, (it, _) = amge_pcg_solve(H, H.levels[0].A, b, rtol=1e-8)
        r = np.linalg.norm(b - A @ x)
        assert r < 1e-6 * np.linalg.norm(b)
        iters[n_lev] = int(it)
    assert iters[3] <= iters[2] + 8, iters

def test_error_layer():
    """Structured exceptions (elagError.hpp analogs) + raising invariant
    check after a real Coarsen."""
    import os
    import pytest as _pytest
    from parelag_tpu.utils import errors as E
    from parelag_tpu.amge.fespace import DeRhamSequenceFE
    from parelag_tpu.partitioning.partitioners import (
        refined_mesh_partition)

    with _pytest.raises(E.InvalidInput):
        E.test_for_exception(True, E.InvalidInput, "bad")
    E.test_for_exception(False, E.InvalidInput, "ok")
    with _pytest.raises(E.ParelagError):
        E.parelag_assert(False, "nope")
    os.environ["PARELAG_DEBUG"] = "1"
    try:
        with _pytest.raises(E.ParelagError):
            E.debug_assert(False)
    finally:
        os.environ["PARELAG_DEBUG"] = "0"
    E.debug_assert(False)        # gated off: no raise

    # InvalidInput from the topology partition-length validation
    m = hex_grid_mesh(2, 2, 2)
    topo = AgglomeratedTopology.from_mesh(m)
    with _pytest.raises(E.InvalidInput):
        topo.coarsen_local_partitioning(np.zeros(3, dtype=np.int64))

    # raising invariant check on a real coarsening
    m2 = hex_grid_mesh(2, 2, 2).uniform_refinement()
    t2 = AgglomeratedTopology.from_mesh(m2)
    t2.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    seq = DeRhamSequenceFE(t2, m2)
    seq.set_upscaling_targets(0)
    seq.coarsen()
    errs = E.assert_invariants(seq)
    assert all(v < 1e-9 for v in errs.values())


def test_ghost_trailing_rank_owning_nothing():
    """Rank count comes from len(reads): a trailing rank that owns no
    entities still receives its ghosts (review regression)."""
    owner = np.array([0, 0, 1, 1])
    reads = [np.array([0, 1, 2]), np.array([1, 2, 3]), np.array([0, 3])]
    gm = GhostMap.build(owner, reads)
    assert gm.ndev == 3
    assert len(gm.ghosts) == 3
    assert np.array_equal(gm.ghosts[2], [0, 3])
    vals = np.array([10.0, 20.0, 30.0, 40.0])
    copies = gm.distribute(vals)
    assert np.array_equal(copies[2], [10.0, 40.0])
    out = gm.assemble(vals, [np.zeros(1), np.zeros(1), np.array([1.0, 2.0])])
    assert out[0] == 11.0 and out[3] == 42.0
