"""Hybridization of the Hdiv x L2 saddle-point problem.

Rebuild of reference src/amge/HybridHdivL2.{hpp,cpp}: break Hdiv continuity
element-by-element, enforce it back with facet Lagrange multipliers, and
eliminate the element-local blocks:

    H = sum_e C_e A_e^{-1} C_e^T,   A_e = [M_e B_e^T; B_e -w W_e]

(HybridHdivL2::AssembleHybridSystem, HybridHdivL2.cpp:74-528). A multiplier
dof is created for every Hdiv dof on an interior or boundary facet; the
constraint entry is the element-facet orientation for interior facets and +1
on the boundary (our local matrices are globally oriented, so the reference's
rdof sign bookkeeping collapses to the IsSameOrient branch). Multipliers on
natural-BC boundary facets are essential in the hybrid system with value
-rhs_u of the underlying Hdiv dof (RHSTransform, .cpp:529-614). The
element-wise elimination and recovery are embarrassingly parallel - batched
per-element dense factorizations on device in the accelerated path.

Also computes the rescaling vector (CC^T)^{-1} C B^T 1 used by the reference
hybridization solver factory for diagonal rescaling of H
(ParELAG_HybridizationSolverFactory.cpp, GetRescaling).
"""

import numpy as np
import scipy.sparse as sp
import scipy.linalg

from parelag_tpu.ops import csr as C


class HybridHdivL2:
    def __init__(self, seq, W_weight=0.0, ess_hdiv_dofs=None,
                 elem_matrix_scaling=None):
        """seq: a DeRhamSequence level (FE or algebraic) with M[(0,2)] local
        element mass blocks; W_weight: the -w W block weight."""
        self.seq = seq
        self.W_weight = W_weight
        dim = seq.dim
        self.uform, self.pform = dim - 1, dim

        topo = seq.topo
        self.topo = topo
        Wmass = seq.compute_mass_operator(self.pform)
        D = seq.D[self.uform]
        self.B = (Wmass @ D).tocsr()
        self.Wmass = Wmass

        local = seq.M[(0, self.uform)]
        elem_udofs = local.dofs              # per element Hdiv dof list
        elem_Mblocks = local.blocks
        ne = len(elem_udofs)
        nu = seq.dof[self.uform].ndofs
        npp = seq.dof[self.pform].ndofs
        self.nu, self.np = nu, npp
        elem_pdofs = seq.dof[self.pform].entity_dofs(0)
        facet_udofs = seq.dof[self.uform].entity_dofs(1)

        ess_hdiv = np.zeros(nu, dtype=bool) if ess_hdiv_dofs is None \
            else np.asarray(ess_hdiv_dofs, dtype=bool)

        # ---- facet adjacency and boundary attributes ---- #
        B0 = topo.B[0].tocsr()
        facet_nelem = np.asarray(
            C.pattern(B0).sum(axis=0)).ravel().astype(int)
        battr = topo.facet_bdr_attribute
        facet_is_bdr = np.asarray(
            C.pattern(battr).sum(axis=1)).ravel().astype(bool) \
            if battr is not None else np.zeros(len(facet_udofs), dtype=bool)

        # dof -> facet map (only for facet-supported dofs)
        dof_facet = np.full(nu, -1, dtype=np.int64)
        for f, dofs in enumerate(facet_udofs):
            dof_facet[dofs] = f

        # ---- multiplier dofs: one per Hdiv dof on an active facet ---- #
        active_facet = (facet_nelem == 2) | facet_is_bdr
        has_mult = np.zeros(nu, dtype=bool)
        for f in np.nonzero(active_facet)[0]:
            has_mult[facet_udofs[f]] = True
        self.mult_of_dof = np.full(nu, -1, dtype=np.int64)
        self.mult_of_dof[has_mult] = np.arange(has_mult.sum())
        self.dof_of_mult = np.nonzero(has_mult)[0]
        n_mult = int(has_mult.sum())
        self.n_mult = n_mult

        # essential multipliers: natural-BC boundary dofs
        dof_is_bdr = np.zeros(nu, dtype=bool)
        for f in np.nonzero(facet_is_bdr)[0]:
            dof_is_bdr[facet_udofs[f]] = True
        self.ess_mult = np.zeros(n_mult, dtype=bool)
        sel = dof_is_bdr & (~ess_hdiv) & has_mult
        self.ess_mult[self.mult_of_dof[sel]] = True

        # ---- per-element elimination ---- #
        Bg = self.B
        H = C.coo_builder()
        self.elem_udofs = elem_udofs
        self.elem_pdofs = elem_pdofs
        self.elem_mult = []
        self.AinvCT = []
        self.Alu = []
        self.Cloc = []
        cct_diag = np.zeros(n_mult)
        cbt1 = np.zeros(n_mult)
        l2const = seq.L2_const_rep

        for e in range(ne):
            ud = np.asarray(elem_udofs[e])
            pd = np.asarray(elem_pdofs[e])
            k, m = ud.size, pd.size
            A = np.zeros((k + m, k + m))
            Mloc = np.asarray(elem_Mblocks[e])
            if elem_matrix_scaling is not None:
                Mloc = Mloc * elem_matrix_scaling[e]
            A[:k, :k] = Mloc
            Bl = C.extract_submatrix(Bg, pd, ud)
            A[k:, :k] = Bl
            A[:k, k:] = Bl.T
            if self.W_weight != 0.0:
                Wl = C.extract_submatrix(self.Wmass, pd, pd)
                A[k:, k:] = -self.W_weight * Wl

            # local multipliers: dofs of this element with a multiplier,
            # constraint sign = B0[e, facet] for interior facets, +1 on bdr
            lm, sgn, lrow = [], [], []
            pos = {int(d): i for i, d in enumerate(ud)}
            row = B0[e]
            fsigns = {int(f): s for f, s in zip(row.indices, row.data)}
            for i, d in enumerate(ud):
                mi = self.mult_of_dof[d]
                if mi < 0:
                    continue
                f = dof_facet[d]
                lm.append(mi)
                lrow.append(i)
                sgn.append(1.0 if dof_is_bdr[d] else fsigns[int(f)])
            lm = np.asarray(lm, dtype=np.int64)
            Cl = np.zeros((lm.size, k + m))
            Cl[np.arange(lm.size), lrow] = sgn
            lu = scipy.linalg.lu_factor(A)
            AinvCT = scipy.linalg.lu_solve(lu, Cl.T)
            Hloc = Cl @ AinvCT
            Hloc = 0.5 * (Hloc + Hloc.T)
            H.add_block(lm, lm, Hloc)

            self.elem_mult.append(lm)
            self.AinvCT.append(AinvCT)
            self.Alu.append(lu)
            self.Cloc.append(Cl)

            # rescaling vector pieces
            cct_diag[lm] += (Cl ** 2).sum(axis=1)
            one = np.zeros(k + m)
            one[k:] = l2const[pd]
            cbt1[lm] += Cl @ (A @ one)

        Hcsr = H.tocsr((n_mult, n_mult), sum_duplicates=True)
        Hcsr.sum_duplicates()
        self.hybrid_system = Hcsr
        self.rescaling = cbt1 / np.where(cct_diag > 0, cct_diag, 1.0)

    # ------------------------------------------------------------------ #
    def rhs_transform(self, rhs_u, rhs_p):
        """(HybridHdivL2::RHSTransform) returns (hybrid_rhs, essential_data)
        and caches per-element A^{-1} f for recovery."""
        g = np.zeros(self.n_mult)
        ess_data = np.zeros(self.n_mult)
        self.Ainv_f = []
        for e in range(len(self.elem_udofs)):
            ud = np.asarray(self.elem_udofs[e])
            pd = np.asarray(self.elem_pdofs[e])
            k = ud.size
            f = np.concatenate([np.zeros(k), rhs_p[pd]])
            af = scipy.linalg.lu_solve(self.Alu[e], f)
            self.Ainv_f.append(af)
            g[self.elem_mult[e]] += self.AinvCT[e].T @ f
            for i, d in enumerate(ud):
                mi = self.mult_of_dof[d]
                if mi >= 0:
                    ess_data[mi] = -rhs_u[d]
        return g, ess_data

    def recover(self, mu):
        """(HybridHdivL2::RecoverOriginalSolution) multipliers -> (u, p)."""
        u = np.zeros(self.nu)
        p = np.zeros(self.np)
        for e in range(len(self.elem_udofs)):
            ud = np.asarray(self.elem_udofs[e])
            pd = np.asarray(self.elem_pdofs[e])
            k = ud.size
            v = self.AinvCT[e] @ mu[self.elem_mult[e]] - self.Ainv_f[e]
            u[ud] = -v[:k]
            p[pd] = -v[k:]
        return u, p

    # ------------------------------------------------------------------ #
    def solve(self, rhs_u, rhs_p, solver="direct", rtol=1e-10,
              rescale=False):
        """Full hybridized solve (the HybridizationSolver::Mult flow,
        ParELAG_HybridizationSolver.hpp:59-67)."""
        import scipy.sparse.linalg as spla
        g, ess_data = self.rhs_transform(rhs_u, rhs_p)
        H = self.hybrid_system.copy()
        mu = np.zeros(self.n_mult)
        ess = self.ess_mult
        mu[ess] = ess_data[ess]
        g = g - H @ (mu * ess)
        keep = ~ess
        if keep.sum() == 0:
            return self.recover(mu)
        Hff = H[keep][:, keep].tocsc()
        gf = g[keep]
        if rescale:
            d = self.rescaling[keep]
            d = np.where(np.abs(d) > 0, d, 1.0)
            Hff = sp.diags(d) @ Hff @ sp.diags(d)
            gf = d * gf
        if solver == "direct":
            xf = spla.spsolve(Hff, gf)
        elif solver == "device":
            # TPU-native path: the hybridized multiplier system is SPD and
            # well-conditioned after rescaling — jitted l1-Jacobi PCG on the
            # device sparse format (operator passed as a jit argument)
            import jax
            import jax.numpy as jnp
            from parelag_tpu.ops.device_sparse import from_scipy
            from parelag_tpu.solvers.smoothers import make_l1_jacobi
            from parelag_tpu.solvers.cg import pcg
            Hcsr = Hff.tocsr()
            Hd = from_scipy(Hcsr, dtype=np.float64)
            smoother = make_l1_jacobi(Hcsr)

            @jax.jit
            def _solve(Hdev, dinv, b):
                return pcg(lambda v: Hdev @ v, b,
                           precond=lambda r: dinv * r,
                           rtol=rtol, atol=0.0, maxiter=2000)

            xj, info = _solve(Hd, smoother.dinv, jnp.asarray(gf))
            xf = np.asarray(xj)
        else:
            dinv = 1.0 / Hff.diagonal()
            M = spla.LinearOperator(Hff.shape, matvec=lambda r: dinv * r)
            xf, info = spla.cg(Hff.tocsr(), gf, M=M, rtol=rtol,
                               atol=0.0, maxiter=2000)
        if rescale:
            xf = d * xf
        mu[keep] = xf
        return self.recover(mu)
