"""End-to-end distributed Coarsen over rank patches == serial, all forms.

The strongest acceptance the reference has for its MPI setup is that
serial and parallel runs print the same golden numbers (SURVEY.md §4.5).
Here we assert something stronger: the distributed setup (each rank
coarsening only its patch — owned elements + complete halo agglomerates —
and keeping its owned coarse entities) reproduces the serial interpolation
P, coarse derivative D and coarse operator DIGIT-EXACTLY for every form,
and the distributed RAP rows solve the coarse problem identically. No rank
ever touches a global matrix.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import (
    cartesian_partition, refined_mesh_partition)
from parelag_tpu.parallel.dist_coarsen import (
    distributed_coarsen, global_coarse_numbering, coarse_entity_reps,
    rank_P_rows, rank_D_rows, rank_coarse_operator_rows, publish_P)

N_RANKS = 4


def _setup(nx=4):
    mesh = hex_grid_mesh(nx, nx, nx).uniform_refinement()
    ne = mesh.num_elements
    # AEs = refinement parents; ranks = cartesian quadrants of the AE grid
    part = refined_mesh_partition(ne, ne // 8)
    ae_grid = cartesian_partition((nx, nx, nx), (nx // 2, nx // 2, nx))
    rank_of_elem = ae_grid[part]
    return mesh, rank_of_elem, part


@pytest.fixture(scope="module")
def dist():
    mesh, rank_of_elem, part = _setup()
    patches, gents = distributed_coarsen(
        mesh, rank_of_elem, part, N_RANKS, upscaling_order=0)
    # serial reference
    topo = AgglomeratedTopology.from_mesh(mesh)
    topo.coarsen_local_partitioning(part)
    seq = DeRhamSequenceFE(topo, mesh)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen()
    return mesh, patches, gents, seq, coarse


def _serial_col_map(seq, gents, numbering, form, dim=3):
    """Map serial coarse dof -> global distributed numbering via the
    (codim, representative, within-entity index) identity."""
    cdof = seq.coarser.dof[form]
    max_codim = dim - form
    # serial entity reps: min member fine gid == min member fine id
    out = np.full(cdof.ndofs, -1, dtype=np.int64)
    # reconstruct the distributed ordering (codim desc, rep asc, index)
    cursor = 0
    for codim in range(max_codim, -1, -1):
        AE_e = sp.csr_matrix(seq.topo.AEntity_entity[codim])
        n = AE_e.shape[0]
        reps = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        rows = np.repeat(np.arange(n), np.diff(AE_e.indptr))
        np.minimum.at(reps, rows, AE_e.indices)
        o = cdof.interior_offsets[codim]
        counts = np.diff(o)
        for i in np.argsort(reps):
            out[o[i]:o[i + 1]] = cursor + np.arange(counts[i])
            cursor += counts[i]
    return out


@pytest.mark.parametrize("form", [0, 1, 2, 3])
def test_distributed_P_matches_serial(dist, form):
    mesh, patches, gents, seq, coarse = dist
    numbering = global_coarse_numbering(patches, gents, form)
    ncoarse = seq.coarser.dof[form].ndofs
    assert numbering.ndofs == ncoarse

    nfine = seq.dof[form].ndofs
    rows, cols, vals = [], [], []
    for p in patches:
        r, c, v = rank_P_rows(p, gents, numbering, form, nfine)
        rows.append(r)
        cols.append(c)
        vals.append(v)
    P_dist = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(nfine, ncoarse)).tocsr()
    # each owned column contributed exactly once -> no duplicate summing
    colmap = _serial_col_map(seq, gents, numbering, form)
    P_serial = sp.csr_matrix(seq.P[form])[:, np.argsort(colmap)]
    d = (P_dist - P_serial).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-12, \
        f"form {form}: distributed P differs"


@pytest.mark.parametrize("form", [0, 1, 2])
def test_distributed_D_matches_serial(dist, form):
    mesh, patches, gents, seq, coarse = dist
    num_u = global_coarse_numbering(patches, gents, form)
    num_p = global_coarse_numbering(patches, gents, form + 1)
    rows, cols, vals = [], [], []
    for p in patches:
        r, c, v = rank_D_rows(p, num_p, num_u, form)
        rows.append(r)
        cols.append(c)
        vals.append(v)
    D_dist = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(num_p.ndofs, num_u.ndofs)).tocsr()
    cmap_u = _serial_col_map(seq, gents, num_u, form)
    cmap_p = _serial_col_map(seq, gents, num_p, form + 1)
    D_serial = sp.csr_matrix(coarse.D[form])[
        np.argsort(cmap_p)][:, np.argsort(cmap_u)]
    d = (D_dist - D_serial).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-12, \
        f"form {form}: distributed coarse D differs"


def test_distributed_rap_and_solve(dist):
    """Distributed RAP: every rank contributes its owned rows of
    Ac = P^T (M + D^T W D) P computed purely from patch data; the union
    equals the serial coarse operator and solves identically."""
    mesh, patches, gents, seq, coarse = dist
    form = 0
    numbering = global_coarse_numbering(patches, gents, form)

    def patch_A(p):
        M = p.seq.compute_mass_operator(form)
        W = p.seq.compute_mass_operator(form + 1)
        D = p.seq.D[form]
        return (M + D.T @ W @ D).tocsr()

    n_fine = seq.dof[form].ndofs
    published = publish_P(patches, gents, numbering, form, n_fine)
    rows, cols, vals = [], [], []
    for p in patches:
        r, c, v = rank_coarse_operator_rows(
            p, gents, numbering, form, patch_A, published, n_fine)
        rows.append(r)
        cols.append(c)
        vals.append(v)
    Ac = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(numbering.ndofs, numbering.ndofs)).tocsr()

    M = seq.compute_mass_operator(form)
    W = seq.compute_mass_operator(form + 1)
    A = (M + seq.D[form].T @ W @ seq.D[form]).tocsr()
    cmap = _serial_col_map(seq, gents, numbering, form)
    perm = np.argsort(cmap)
    Ac_serial = sp.csr_matrix(
        (seq.P[form].T @ A @ seq.P[form]))[perm][:, perm]
    d = (Ac - Ac_serial).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-10

    # coarse solve from the distributed operator == serial coarse solve
    rng = np.random.RandomState(0)
    b = rng.randn(numbering.ndofs)
    import scipy.sparse.linalg as spla
    reg = sp.identity(numbering.ndofs) * 1e-8   # pure-Neumann guard
    x1 = spla.spsolve((Ac + reg).tocsc(), b)
    x2 = spla.spsolve((Ac_serial + reg).tocsc(), b)
    assert np.abs(x1 - x2).max() < 1e-7 * max(np.abs(x2).max(), 1)


def test_patch_sizes_are_local(dist):
    """Sanity: patches are strict subsets (no rank sees the global mesh)."""
    mesh, patches, gents, seq, coarse = dist
    for p in patches:
        assert p.mesh.num_elements < mesh.num_elements
        assert p.owned_elem_mask.sum() < p.mesh.num_elements


def test_setup_batches_on_device_mesh(dist):
    """The distributed setup's dense batches execute over the 8-device mesh
    (shard_map, one rank's batch per device) and match host LAPACK: the
    trace-stage SVDs and extension-stage solves of every rank."""
    import jax
    from jax.sharding import Mesh
    from parelag_tpu.parallel.shard_setup import (
        sharded_batched_svd, sharded_solve_groups)
    mesh, patches, gents, seq, coarse = dist
    devs = np.array(jax.devices()[:8])
    jmesh = Mesh(devs, ("dd",))
    rng = np.random.RandomState(0)

    # per-rank stacked trace-style target batches (from patch-local data)
    batches = []
    for p in patches:
        m = 3 + p.rank
        batches.append(rng.randn(m, 12, 4))
    out = sharded_batched_svd(batches, jmesh)
    for r, per_rank in enumerate(out):
        assert len(per_rank) == batches[r].shape[0]
        for i, (U, s) in enumerate(per_rank):
            Uh, sh, _ = np.linalg.svd(batches[r][i], full_matrices=False)
            assert np.allclose(s, sh, atol=1e-10)
            assert np.allclose(np.abs(U.T @ Uh), np.eye(4), atol=1e-8)

    # per-rank extension-style saddle solves
    As, Bs = [], []
    for p in patches:
        m = 2 + p.rank
        A = rng.randn(m, 6, 6) + 6 * np.eye(6)
        As.append(A)
        Bs.append(rng.randn(m, 6, 3))
    Xs = sharded_solve_groups(As, Bs, jmesh)
    for r in range(len(patches)):
        ref = np.linalg.solve(As[r], Bs[r])
        assert np.allclose(Xs[r], ref, atol=1e-10)
