"""Distributed de Rham coarsening, stage 1: coarse traces by owner rank.

The reference's setup distributes every coarsening stage over MPI ranks;
shared coarse entities are computed once by their owner from gathered
neighbor data and the resulting coarse basis columns are broadcast back
(SharedEntityCommunication used inside ComputeCoarseTraces,
DeRhamSequence.cpp:1723-2000). This module runs that protocol for the
codim-1 trace stage (the stage that carries ALL inter-rank coupling — the
coarse facet spaces): each rank computes the PV + deflated-target weighted
SVD for the coarse facets it owns, using only data a rank would hold
locally (trace-mass blocks and target values of its halo facets), then
"sends" the resulting local P blocks to the other adjacent rank.

Validation contract (test_dist_sequence): digit-identical per-facet trace
blocks, counts and coarse mass blocks vs the serial
DeRhamSequence._compute_coarse_traces.
"""

from dataclasses import dataclass

import numpy as np

from parelag_tpu.ops.batched import batched_weighted_svd


@dataclass
class FacetTraceResult:
    facet: int                  # coarse facet id
    owner: int
    dofs: np.ndarray            # fine dofs of the facet (closure order)
    p_block: np.ndarray         # (n_dofs, 1 + nkeep): [pv | kept traces]
    cmass: np.ndarray           # coarse facet mass block
    n_sent_to: tuple            # ranks that received the block


def distributed_facet_traces(seq, jform, fc_AF, rank_of_elem, R,
                             svd_tol=None):
    """Owner-computes codim-1 trace stage for `jform` (RT in 3D).

    seq: fine DeRhamSequenceFE with targets set and agglomerate_dofs done.
    fc_AF: fine-facet x coarse-facet table; rank_of_elem: rank per fine
    element (coarse-facet owner = min adjacent rank; receivers = the other
    adjacent ranks). Returns (list of FacetTraceResult, stats dict).
    """
    import scipy.sparse as sp

    B0t = sp.csr_matrix(seq.topo.B[0]).T.tocsr()
    rank_of_elem = np.asarray(rank_of_elem)

    def adjacent_ranks(members):
        elems = np.unique(np.concatenate(
            [B0t.indices[B0t.indptr[f]:B0t.indptr[f + 1]]
             for f in members]))
        return np.unique(rank_of_elem[elems])

    svd_tol = seq.svd_tol if svd_tol is None else svd_tol
    codim = 1
    pv = seq.compute_pv_traces(codim)
    targets = seq.targets[jform]
    n_targets = targets.shape[1] if targets is not None else 0
    Mlocal = seq.M[(codim, jform)]

    csc = sp.csc_matrix(fc_AF)
    n_af = csc.shape[1]

    # per coarse facet: members + owner (min over members for robustness)
    results = []
    Ms, Ts, metas = [], [], []
    n_msgs = 0
    bytes_moved = 0
    for j in range(n_af):
        members = csc.indices[csc.indptr[j]:csc.indptr[j + 1]]
        if members.size == 0:
            continue
        adj = adjacent_ranks(members)
        owner = int(adj.min())
        # RANK-LOCAL assembly: the owner holds the member facets' local
        # trace-mass blocks and the dof values of pv/targets on them
        dofs = np.unique(np.concatenate(
            [np.asarray(Mlocal.dofs[f]) for f in members]))
        pos = {int(d): i for i, d in enumerate(dofs)}
        Mloc = np.zeros((dofs.size, dofs.size))
        for f in members:
            idx = np.array([pos[int(d)] for d in Mlocal.dofs[f]])
            Mloc[np.ix_(idx, idx)] += np.asarray(Mlocal.blocks[f])
        loc_pv = pv[dofs]
        T = targets[dofs, :].copy() if n_targets else np.zeros(
            (dofs.size, 0))
        pv_m = Mloc @ loc_pv
        pv_dot_pv = float(loc_pv @ pv_m)
        if T.shape[1]:
            T -= np.outer(loc_pv, (pv_m @ T) / pv_dot_pv)
        Ms.append(Mloc)
        Ts.append(T)
        metas.append((j, owner, dofs, loc_pv, pv_dot_pv,
                      tuple(int(r) for r in adj if r != owner)))

    svds = batched_weighted_svd(Ms, Ts)
    for (j, owner, dofs, loc_pv, pv_dot_pv, receivers), Mloc, (U, s) in zip(
            metas, Ms, svds):
        s_tol = pv_dot_pv * svd_tol
        nkeep = int(np.searchsorted(-s, -s_tol))
        p_block = np.concatenate(
            [loc_pv[:, None], np.sqrt(pv_dot_pv) * U[:, :nkeep]], axis=1)
        cmass = p_block.T @ Mloc @ p_block
        cmass = 0.5 * (cmass + cmass.T)
        results.append(FacetTraceResult(
            facet=j, owner=owner, dofs=dofs, p_block=p_block,
            cmass=cmass, n_sent_to=receivers))
        # broadcast direction of SharedEntityCommunication: the block goes
        # to every other rank adjacent to the coarse facet
        n_msgs += len(receivers)
        bytes_moved += p_block.size * 8 * len(receivers)
    return results, dict(n_msgs=n_msgs, bytes_moved=bytes_moved,
                         n_af=len(results))
