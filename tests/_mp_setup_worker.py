"""Worker for the simulated multi-process distributed SETUP test.

Round-3 verdict #7: the 2-process lane covered only the solve (problem
construction was rank-replicated).  Here each process coarsens ONLY its
own rank's patch (distributed_coarsen_multilevel(ranks=[pid])), the
cross-rank numbering metadata and owner-published P/A triplets ride
jax.experimental.multihost_utils.process_allgather (the
SharingMap::SetUp / AssembleNonLocal payloads,
DeRhamSequence.cpp:1928-2014), and the assembled global operators must
match the single-process distributed setup digit-exact (whose parity
vs the serial engine is tests/test_dist_hierarchy.py).
"""

import os
import sys

FORM = 0


def main():
    pid = sys.argv[1]
    port = sys.argv[2]
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = pid
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import scipy.sparse as sp
    from jax.experimental import multihost_utils as mhu

    from parelag_tpu.mesh.mesh import hex_grid_mesh
    from parelag_tpu.partitioning.partitioners import cartesian_partition
    from parelag_tpu.parallel.sharding import (
        ensure_distributed_initialized)
    from parelag_tpu.parallel.dist_hierarchy import (
        distributed_coarsen_multilevel, distributed_operator_setup,
        patch_numbering_meta, numbering_offsets_from_meta,
        patch_loc2glob_from_meta, rank_P_rows_level, rank_fine_rows,
        rank_operator_rows_level, fine_dof_gids, compose_partitions)
    from parelag_tpu.parallel.dist_coarsen import CoarseNumbering

    ensure_distributed_initialized()
    assert jax.process_count() == 2
    me = int(pid)

    def gather_ragged(arr):
        """Allgather a per-process ragged (n, ...) array; returns the
        list over processes (pad exchanged via a size pre-gather)."""
        arr = np.ascontiguousarray(arr)
        n = np.asarray([arr.shape[0]], np.int64)
        ns = np.asarray(mhu.process_allgather(n)).reshape(-1)
        m = max(int(ns.max()), 1)
        pad = np.zeros((m - arr.shape[0],) + arr.shape[1:], arr.dtype)
        buf = np.concatenate([arr, pad], axis=0)
        got = np.asarray(mhu.process_allgather(buf))
        return [got[i, :int(ns[i])] for i in range(ns.size)]

    # deterministic problem: 8x8x4 hex grid, two 2x2x2 coarsenings,
    # ranks = x-halves of the 4 top-level AEs (nested by construction)
    m = hex_grid_mesh(8, 8, 4)
    partitions = [cartesian_partition((8, 8, 4), (2, 2, 2)),
                  cartesian_partition((4, 4, 2), (2, 2, 2))]
    comp = compose_partitions(partitions)
    ae2_rank = (np.arange(int(comp[-1].max()) + 1) % 2)
    rank_of_elem = ae2_rank[comp[-1]]

    # ---- each process coarsens ONLY its own rank's patch ---- #
    patches, gents = distributed_coarsen_multilevel(
        m, rank_of_elem, partitions, 2, upscaling_order=0,
        ranks=[me])
    assert len(patches) == 1 and patches[0].rank == me
    patch = patches[0]
    n_coarsen = len(patch.seqs) - 1
    dim = 3

    def patch_A(p):
        seq = p.seqs[0]
        M = seq.compute_mass_operator(FORM)
        W = seq.compute_mass_operator(FORM + 1)
        D = seq.D[FORM]
        return (M + D.T @ W @ D).tocsr()

    # ---- fine owner: min adjacent element rank, allreduced ---- #
    fg = fine_dof_gids(patch, gents, FORM, dim)
    n_fine_local = int(fg.max()) + 1
    n_fine = int(np.asarray(mhu.process_allgather(
        np.asarray([n_fine_local]))).max())
    big = np.iinfo(np.int64).max
    mine = np.full(n_fine, big, dtype=np.int64)
    pat = sp.csr_matrix(
        patch.seqs[0].dof[FORM].entity_dof_pattern(0)).T.tocoo()
    ranks = np.asarray(rank_of_elem)[patch.elem_gids]
    np.minimum.at(mine, fg[pat.row], ranks[pat.col])
    fine_owner = np.minimum.reduce(gather_ragged(mine[None, :]))[0]

    # ---- per-level numbering via exchanged metadata ---- #
    max_codim = dim - FORM
    numberings, published = [], []
    num_prev = None
    for lvl in range(n_coarsen):
        meta = patch_numbering_meta(patch, gents, FORM, lvl + 1, dim)
        # pack owned rows: [codim, rep, mcnt, msum, count]
        rows = []
        for codim, (reps, mcnt, msum, orank, counts) in meta.items():
            own = np.nonzero(orank == me)[0]
            rows.append(np.stack([
                np.full(own.size, codim, np.int64), reps[own],
                mcnt[own], msum[own], counts[own]], axis=1))
        packed = (np.concatenate(rows, axis=0) if rows
                  else np.zeros((0, 5), np.int64))
        per_proc = gather_ragged(packed)
        metas_by_rank = []
        for r, mat in enumerate(per_proc):
            md = {}
            for codim in range(max_codim, -1, -1):
                sel = mat[mat[:, 0] == codim]
                md[codim] = (sel[:, 1], sel[:, 2], sel[:, 3],
                             np.full(sel.shape[0], r, np.int64),
                             sel[:, 4])
            metas_by_rank.append((r, md))
        ndofs, offset_of, sig_of, owner = numbering_offsets_from_meta(
            metas_by_rank, max_codim)
        loc2glob = {me: patch_loc2glob_from_meta(
            patch, meta, offset_of, sig_of, FORM, lvl + 1, dim)}
        num = CoarseNumbering(ndofs, loc2glob, owner)

        # owner-published P triplets, allgathered
        r_, c_, v_ = rank_P_rows_level(patch, gents, num_prev, num,
                                       FORM, lvl, dim)
        rc = gather_ragged(np.stack([r_, c_], axis=1))
        vv = gather_ragged(v_[:, None])
        published.append((np.concatenate([x[:, 0] for x in rc]),
                          np.concatenate([x[:, 1] for x in rc]),
                          np.concatenate([x[:, 0] for x in vv])))
        numberings.append(num)
        num_prev = num

    # ---- owned operator rows per level, allgathered + assembled ---- #
    A_glob = []
    r_, c_, v_ = rank_fine_rows(patch, gents, FORM, patch_A,
                                fine_owner, n_fine, dim)
    levels_rcv = [(r_, c_, v_)]
    for lvl in range(1, n_coarsen + 1):
        levels_rcv.append(rank_operator_rows_level(
            patch, gents, published, numberings, FORM, lvl, patch_A,
            n_fine, dim))
    ndofs_lvl = [n_fine] + [n.ndofs for n in numberings]
    for lvl, (r_, c_, v_) in enumerate(levels_rcv):
        rc = gather_ragged(np.stack([r_, c_], axis=1))
        vv = gather_ragged(v_[:, None])
        n_l = ndofs_lvl[lvl]
        A = sp.coo_matrix(
            (np.concatenate([x[:, 0] for x in vv]),
             (np.concatenate([x[:, 0] for x in rc]),
              np.concatenate([x[:, 1] for x in rc]))),
            shape=(n_l, n_l)).tocsr()
        A.sum_duplicates()
        A_glob.append(A)

    # ---- oracle: the single-process distributed setup ---- #
    patches_sp, gents_sp = distributed_coarsen_multilevel(
        m, rank_of_elem, partitions, 2, upscaling_order=0)
    setup_sp = distributed_operator_setup(
        patches_sp, gents_sp, FORM, patch_A, rank_of_elem)
    assert setup_sp.ndofs == ndofs_lvl, (setup_sp.ndofs, ndofs_lvl)
    digest = 0.0
    for lvl in range(n_coarsen + 1):
        rows = setup_sp.A_rows[lvl]
        n_l = setup_sp.ndofs[lvl]
        A_ref = sp.coo_matrix(
            (np.concatenate([t[2] for t in rows]),
             (np.concatenate([t[0] for t in rows]),
              np.concatenate([t[1] for t in rows]))),
            shape=(n_l, n_l)).tocsr()
        A_ref.sum_duplicates()
        d = abs(A_glob[lvl] - A_ref)
        err = (d.max() if d.nnz else 0.0) / abs(A_ref).max()
        assert err < 1e-13, (lvl, err)
        digest += float(np.abs(A_glob[lvl].data).sum())
    for lvl in range(n_coarsen):
        r0, c0, v0 = published[lvl]
        r1, c1, v1 = setup_sp.P_published[lvl]
        k0 = np.lexsort((c0, r0))
        k1 = np.lexsort((c1, r1))
        assert np.array_equal(r0[k0], r1[k1])
        assert np.array_equal(c0[k0], c1[k1])
        assert np.abs(v0[k0] - v1[k1]).max() < 1e-14
    print(f"MPSETUPOK pid={pid} levels={n_coarsen + 1} "
          f"ndofs={ndofs_lvl} digest={digest:.12e}", flush=True)


if __name__ == "__main__":
    main()
