"""Local spectral target generation (spectral AMGe).

Rebuild of reference src/amge/LocalSpectralTargets.{hpp,cpp}: per-agglomerate
generalized eigenproblems produce problem-adapted coarse-space targets.

* compute_local_spectral_targets: A_loc x = lambda diag(d) x per AE with the
  weighted-l1 diagonal d_i = sum_j |a_ij| sqrt(a_ii/a_jj)
  (Weightedl1Smoother, ParELAG_MatrixUtils.cpp:967-995); keep the smallest
  eigenvectors with |lambda| <= rel_tol (and at least one, at most
  max_evects) — SymEigensolver::ComputeDiagonalSmallerMagnitude semantics
  (ParELAG_Eigensolver.cpp:440-516).

* compute_local_hdiv_l2_spectral_targets: per-AE mixed eigenproblem on the
  boundary-flux + pressure Schur complement
      S = [B; C] M^{-1} [B^T C^T],  S x = lambda blockdiag(W, Q) x
  giving L2 targets (pressure part) and Hdiv coarse-facet trace targets
  (restrictions of the boundary-flux parts of adjacent agglomerates)
  (LocalSpectralTargets.cpp:93-297).

These loops are embarrassingly parallel small dense eigensolves — the
archetypal vmapped batched kernel on TPU (ops.batched handles bucketing).
"""

import numpy as np
import scipy.linalg


def weighted_l1_diagonal(A) -> np.ndarray:
    """d_i = sum_j |a_ij| sqrt(a_ii / a_jj)."""
    A = np.asarray(A)
    dg = np.diag(A)
    return (np.abs(A) * np.sqrt(np.outer(dg, 1.0 / dg))).sum(axis=1)


def smallest_generalized(A, D, rel_tol, max_evects, max_eval=1.0):
    """Eigenpairs of A x = lambda D x (D diagonal or dense SPD), keeping
    min(#{|lambda| <= rel_tol*max_eval}, max_evects) >= 1 smallest."""
    A = np.asarray(A)
    B = np.diag(D) if np.ndim(D) == 1 else np.asarray(D)
    w, V = scipy.linalg.eigh(A, B)
    count = int(np.sum(np.abs(w) <= rel_tol * max_eval))
    m = max(min(count, max_evects) if max_evects >= 1 else count, 1)
    return w[:m], V[:, :m]


def compute_local_spectral_targets(agg_blocks, rel_tol, max_evects):
    """agg_blocks: per-AE dense local operators (e.g. M + D^T W D on the
    agglomerate); returns per-AE (n_ae_dofs, m) target arrays."""
    out = []
    for A in agg_blocks:
        d = weighted_l1_diagonal(A)
        _, V = smallest_generalized(A, d, rel_tol, max_evects)
        out.append(V)
    return out


def compute_local_hdiv_l2_spectral_targets(
        seq, rel_tol, max_evects, kinv_scaling=None):
    """Per-AE mixed spectral targets for the Hdiv-L2 pair
    (ComputeLocalHdivL2SpectralTargetsFromAEntity).

    Returns (hdiv_trace_targets per coarse facet, l2_targets per coarse
    element), each a list of (n_ae_dofs, m) arrays in the DofAgglomeration
    closure-dof order.
    """
    from parelag_tpu.amge.localmass import assemble_agglomerate_blocks
    from parelag_tpu.ops import csr as C

    dim = seq.dim
    uform, pform = dim - 1, dim
    uagg = seq.dofagg[uform]
    pagg = seq.dofagg[pform]
    topo = seq.topo
    AE_e = topo.AEntity_entity[0]
    Md = assemble_agglomerate_blocks(seq.M[(0, uform)], AE_e, uagg, 0)
    Wd = assemble_agglomerate_blocks(seq.M[(0, pform)], AE_e, pagg, 0)
    # Q: facet trace mass of Hdiv, gathered per AE over its boundary dofs
    Qlocal = seq.M[(1, uform)]
    D = seq.D[uform].tocsr()

    n_ae = len(Md)
    AE_AF = C.pattern(topo.coarser.B[0]).tocsr()
    AF_AE = AE_AF.T.tocsr()
    n_af = AF_AE.shape[0]

    # fine facets on each AE's boundary (orientation product cancels the
    # interior ones, reference AE_fc pattern)
    AE_bfc = C.drop_zeros((AE_e @ topo.B[0]).tocsr(), 1e-10)

    l2_targets = []
    AE_mu = []
    for iae in range(n_ae):
        u_all = uagg.ae_dofs(0)[iae]
        nu_int = int(uagg.n_interior(0)[iae])
        u_bdr = u_all[nu_int:]
        p_all = pagg.ae_dofs(0)[iae]
        Mloc = Md[iae]
        if kinv_scaling is not None:
            Mloc = Mloc * kinv_scaling[iae]
        Wloc = Wd[iae]
        Dloc = C.extract_submatrix(D, p_all, u_all)
        Bloc = Wloc @ Dloc
        # Q: assembled facet trace mass on the AE's boundary dofs
        nb = u_bdr.size
        Qloc = np.zeros((nb, nb))
        pos = {int(d): i for i, d in enumerate(u_bdr)}
        bfacets = AE_bfc.indices[AE_bfc.indptr[iae]:AE_bfc.indptr[iae + 1]]
        for f in bfacets:
            dofs = np.asarray(Qlocal.dofs[f])
            idx = np.array([pos[int(d)] for d in dofs])
            Qloc[np.ix_(idx, idx)] += np.asarray(Qlocal.blocks[f])
        # C: Q-weighted boundary trace rows against all AE dofs (reference
        # extracts C from the Q matrix itself,
        # LocalSpectralTargets.cpp:139 — NOT identity rows; the trace block
        # of the Schur eigenproblem is Q M^{-1} Q vs Q)
        Cloc = np.concatenate(
            [np.zeros((nb, nu_int)), Qloc], axis=1)
        Minv_BC = np.linalg.solve(
            Mloc, np.concatenate([Bloc, Cloc], axis=0).T)
        S = np.concatenate([Bloc, Cloc], axis=0) @ Minv_BC
        S = 0.5 * (S + S.T)
        RHS = scipy.linalg.block_diag(Wloc, Qloc)
        w, V = scipy.linalg.eigh(S, RHS)
        count = int(np.sum(np.abs(w) <= rel_tol * max(abs(w[-1]), 1.0)))
        m = max(min(count, max_evects) if max_evects >= 1 else count, 1)
        V = V[:, :m]
        if V[0, 0] < 0:
            V[:, 0] *= -1
        npl = p_all.size
        l2_targets.append(V[:npl, :].copy())
        AE_mu.append((u_bdr, V[npl:, :].copy()))

    # coarse-facet Hdiv trace targets: restrict adjacent AEs' mu parts
    hdiv_trace_targets = []
    for iaf in range(n_af):
        af_dofs = uagg.ae_dofs(1)[iaf]
        aes = AF_AE.indices[AF_AE.indptr[iaf]:AF_AE.indptr[iaf + 1]]
        cols = []
        for ae in aes:
            u_bdr, mu = AE_mu[ae]
            pos = {int(d): i for i, d in enumerate(u_bdr)}
            idx = np.array([pos[int(d)] for d in af_dofs])
            cols.append(mu[idx, :])
        if cols:
            hdiv_trace_targets.append(np.concatenate(cols, axis=1))
        else:
            hdiv_trace_targets.append(np.ones((af_dofs.size, 1)))
    return hdiv_trace_targets, l2_targets
