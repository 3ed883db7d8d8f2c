"""DeRhamSequence: the AMGe coarsening engine.

Rebuild of reference src/amge/DeRhamSequence.{hpp,cpp} (the heart of ParElag).
A sequence holds, per level, the four spaces of the 3D de Rham complex
H1 -> H(curl) -> H(div) -> L2 with derivative operators D[j], local mass
matrices M[(codim, j)], targets, and — after coarsen() — the interpolators
P[j], cochain projectors Pi[j] and the coarse sequence with coarse D/M.

coarsen() (reference DeRhamSequence::Coarsen, DeRhamSequence.cpp:572-692)
runs per form, L2 first, H1 last:

  1. _compute_coarse_traces  (.cpp:1521-2086): per agglomerated trace entity,
     deflate targets against the PV trace in the local mass inner product,
     M-weighted SVD, threshold sigma >= ||pv||_M^2 * svd_tol -> coarse trace
     dofs; the PV dof is RangeT-type, the rest NullSpace.
  2. _h_facet_extension      (.cpp:2169-2589): per codim_dom agglomerate,
     harmonic extension of all boundary coarse dofs through the saddle system
       [M  B^T 0 ; B 0 T^T ; 0 T 0]   (B = W D, T = (W pv_loc)^T)
     building coarse-D rows from the Lagrange multiplier; RangeT "bubble"
     dofs whose derivative equals the jform+1 interior NullSpace basis;
     NullSpace dofs from divergence-corrected target extensions (plain SVD,
     absolute threshold).
  3. _h_ridge_peak_extension (.cpp:2589-3050): same at lower codims with the
     regularized system [M B^T; B -C], C = (D_{j+1})^T W2 D_{j+1} restricted
     (div-div regularization, Lashuk-Vassilevski (6.43)), and the coarse-
     derivative compatibility term W * (P_{j+1} D_c) on the right-hand side.

The per-AE dense factorizations and SVDs are the setup-phase hot loops; they
are batched over agglomerates (bucketed + padded + vmapped on device) by
parelag_tpu.ops.batched in the accelerated path.
"""

import numpy as np
import scipy.sparse as sp
import scipy.linalg

from parelag_tpu.ops import csr as C
from parelag_tpu.amge.dofhandler import DofHandlerALG
from parelag_tpu.amge.dofagg import DofAgglomeration
from parelag_tpu.amge.localmass import (
    LocalMass, assemble_agglomerate_blocks)
from parelag_tpu.amge.cochain import CochainProjector
from parelag_tpu.ops.batched import batched_solve

_EPS = np.finfo(np.float64).eps


class DeRhamSequence:
    def __init__(self, topo, nforms):
        self.topo = topo
        self.nforms = nforms
        self.dim = topo.dim
        self.dof = [None] * nforms
        self.D = [None] * (nforms - 1)
        self.M = {}
        self.targets = [None] * nforms
        self.pv_traces = [None] * nforms
        self.svd_tol = 1e-9
        self.jform_start = 0
        self.P = [None] * nforms
        self.Pi = [None] * nforms
        self.coarser = None
        self.finer = None
        self.dofagg = [None] * nforms
        self.L2_const_rep = None
        # per-AE dense solve execution: 'host' (scipy loop), 'device'
        # (bucketed vmapped batches), or 'auto'
        self.solve_backend = "auto"
        # (codim, jform) -> per-AE (n_ae_dofs, k) local target arrays in
        # DofAgglomeration closure-dof order (LocalTargets_ analog,
        # DeRhamSequence.hpp:614-727)
        self.local_targets = {}

    # ------------------------------------------------------------------ #
    def set_targets(self, targets):
        self.targets = [np.asarray(t) if t is not None else None
                        for t in targets]

    def agglomerate_dofs(self):
        """Build DofAgglomerations for all active forms
        (DeRhamSequence::AgglomerateDofs, DeRhamSequence.cpp:98-110)."""
        for j in range(self.jform_start, self.nforms):
            if self.dofagg[j] is None:
                self.dofagg[j] = DofAgglomeration(self.topo, self.dof[j])

    def set_local_targets(self, codim, jform, local_list):
        """Per-AE local targets at (codim, jform); each entry is a
        (n_ae_closure_dofs, k) array in DofAgglomeration dof order
        (SetLocalTargets/OwnLocalTargets, DeRhamSequence.cpp:112-174)."""
        self.agglomerate_dofs()
        ae_dofs = self.dofagg[jform].ae_dofs(codim)
        assert len(local_list) == len(ae_dofs)
        for t, d in zip(local_list, ae_dofs):
            assert t.shape[0] == d.size
        self.local_targets[(codim, jform)] = [
            np.asarray(t) for t in local_list]

    def populate_local_targets_from_form(self, jform):
        """Restrict agglomerated-element local targets to lower codims, add
        derivative targets for jform+1, restrict those too
        (PopulateLocalTargetsFromForm + populateLowerCodims +
        targetDerivativesInForm, DeRhamSequence.cpp:185-560; serial
        restriction — the distributed version adds the owner-gather/
        broadcast protocol of SharedEntityCommunication)."""
        self._populate_lower_codims(jform)
        if jform + 1 < self.nforms and (0, jform) in self.local_targets:
            # derivative targets: AE-local D @ targets
            src = self.local_targets[(0, jform)]
            uagg, pagg = self.dofagg[jform], self.dofagg[jform + 1]
            D = self.D[jform].tocsr()
            out = []
            for iae, t in enumerate(src):
                u_all = uagg.ae_dofs(0)[iae]
                p_all = pagg.ae_dofs(0)[iae]
                Dloc = C.extract_submatrix(D, p_all, u_all)
                out.append(Dloc @ t)
            self.set_local_targets(0, jform + 1, out)
            self._populate_lower_codims(jform + 1)

    def _populate_lower_codims(self, jform):
        if (0, jform) not in self.local_targets:
            return
        src = self.local_targets[(0, jform)]
        agg = self.dofagg[jform]
        max_codim = self.dof[jform].max_codim
        # position map: global dof -> row in each AE's local target
        for codim in range(1, max_codim + 1):
            ent_AE = C.pattern(
                self.topo.coarser.connectivity(0, codim)).T.tocsr()
            ae_dofs0 = agg.ae_dofs(0)
            out = []
            for ient in range(ent_AE.shape[0]):
                ed = agg.ae_dofs(codim)[ient]
                aes = ent_AE.indices[
                    ent_AE.indptr[ient]:ent_AE.indptr[ient + 1]]
                cols = []
                for ae in aes:
                    pos = {int(d): i for i, d in enumerate(ae_dofs0[ae])}
                    idx = np.array([pos[int(d)] for d in ed])
                    cols.append(src[ae][idx, :])
                out.append(np.concatenate(cols, axis=1) if cols
                           else np.zeros((ed.size, 0)))
            self.set_local_targets(codim, jform, out)

    def compute_mass_operator(self, jform) -> sp.csr_matrix:
        return self.M[(0, jform)].assemble_global(self.dof[jform].ndofs)

    def compute_pv_traces(self, codim) -> np.ndarray:
        """Algebraic (coarse-level) version: +-orientation at the PV dof of
        each member entity (DeRhamSequenceAlg::computePVTraces,
        DeRhamSequence.cpp:3235). Overridden by DeRhamSequenceFE."""
        jform = self.nforms - 1 - codim
        pv = np.zeros(self.dof[jform].ndofs)
        AE_e = self.topo.AEntity_entity[codim].tocoo()
        first = self.dof[jform].interior_offsets[codim][AE_e.col]
        pv[first] = AE_e.data
        return pv

    # ------------------------------------------------------------------ #
    def coarsen(self, svd_tol=None) -> "DeRhamSequence":
        if svd_tol is not None:
            self.svd_tol = svd_tol
        assert self.topo.coarser is not None, \
            "call topo.coarsen_local_partitioning first"
        coarse = DeRhamSequence(self.topo.coarser, self.nforms)
        coarse.finer = self
        coarse.jform_start = self.jform_start
        coarse.svd_tol = self.svd_tol
        self.coarser = coarse

        self.agglomerate_dofs()

        for codim in range(self.nforms):
            jform = self.nforms - codim - 1
            if jform < self.jform_start:
                break
            cdof = DofHandlerALG(jform, self.topo.coarser)
            coarse.dof[jform] = cdof
            self._P_builder = C.coo_builder()
            self._P_ncols = 0
            self._P_nrows = self.dof[jform].ndofs
            self._P_snapshot = sp.csr_matrix((self._P_nrows, 0))
            self.Pi[jform] = CochainProjector(cdof, self.dofagg[jform])

            self._compute_coarse_traces(jform)

            if codim > 0:
                self._D_builder = C.coo_builder()
                self._extension(jform, self.nforms - jform - 2,
                                use_lagrange=True)
                if codim > 1:
                    self._extension(jform, self.nforms - jform - 3,
                                    use_lagrange=False, with_nulls=True)
                    if codim > 2:
                        self._extension(jform, self.nforms - jform - 4,
                                        use_lagrange=False, with_nulls=False)
                coarse.D[jform] = self._D_builder.tocsr(
                    (coarse.dof[jform + 1].ndofs, cdof.ndofs))

            self.P[jform] = self._P_snapshot
            assert self.P[jform].shape[1] == cdof.ndofs
            self.Pi[jform].compute_projector(self.P[jform])

            if (jform == self.nforms - 3 and jform + 1 < self.nforms
                    and getattr(self.topo, "had_pinch_repair", False)):
                # after the Hcurl-class stage: enrich coarse Hdiv with any
                # curl components the pinched topology left uncovered
                # (regular MIS topology never needs this — gated on the
                # pinch-repair flag to skip the global commuting check)
                self._repair_curl_range(jform)

        # coarsen targets and the L2 constant representation
        for j in range(self.jform_start, self.nforms):
            if self.targets[j] is not None:
                coarse.targets[j] = self.Pi[j].project(self.targets[j])
        if self.L2_const_rep is not None:
            coarse.L2_const_rep = self.Pi[self.nforms - 1].project(
                self.L2_const_rep[:, None])[:, 0]
        return coarse

    # ------------------------------------------------------------------ #
    # stage 1: coarse traces
    # ------------------------------------------------------------------ #
    def _compute_coarse_traces(self, jform):
        codim = self.dim - jform
        cdof = self.coarser.dof[jform]
        cdof.init_codim(codim)
        pv = self.compute_pv_traces(codim)
        self.pv_traces[jform] = pv

        if jform == 0:
            self._compute_0form_traces(cdof, pv)
            return

        dofagg = self.dofagg[jform]
        ae_dofs = dofagg.ae_dofs(codim)
        n_ae = len(ae_dofs)
        AE_e = self.topo.AEntity_entity[codim]
        Md_blocks = assemble_agglomerate_blocks(
            self.M[(codim, jform)], AE_e, dofagg, codim)

        targets = self.targets[jform]
        n_targets = targets.shape[1] if targets is not None else 0
        loc_tars = self.local_targets.get((codim, jform))

        # gather pass: deflated target blocks per AE, then ONE stacked
        # LAPACK call per shape group for the M-weighted SVDs
        Ts, pv_locs, pv_dots = [], [], []
        for iae in range(n_ae):
            dofs = ae_dofs[iae]
            Mloc = Md_blocks[iae]
            loc_pv = pv[dofs]
            T = targets[dofs, :].copy() if n_targets else np.zeros(
                (dofs.size, 0))
            if loc_tars is not None and loc_tars[iae].shape[1]:
                T = np.concatenate([T, loc_tars[iae]], axis=1)
            pv_m = Mloc @ loc_pv
            pv_dot_pv = float(loc_pv @ pv_m)
            if T.shape[1]:
                T -= np.outer(loc_pv, (pv_m @ T) / pv_dot_pv)
            Ts.append(T)
            pv_locs.append(loc_pv)
            pv_dots.append(pv_dot_pv)
        from parelag_tpu.ops.batched import batched_weighted_svd
        svds = batched_weighted_svd(Md_blocks, Ts)

        coarse_dofs_lists, coarse_blocks = [], []
        counter = 0
        for iae in range(n_ae):
            dofs = ae_dofs[iae]
            Mloc = Md_blocks[iae]
            loc_pv = pv_locs[iae]
            pv_dot_pv = pv_dots[iae]
            U, s = svds[iae]
            s_tol = pv_dot_pv * self.svd_tol
            nkeep = int(np.searchsorted(-s, -s_tol))
            p_loc = np.concatenate(
                [loc_pv[:, None], np.sqrt(pv_dot_pv) * U[:, :nkeep]], axis=1)
            cmass = p_loc.T @ Mloc @ p_loc
            cmass = 0.5 * (cmass + cmass.T)

            cols = np.arange(counter, counter + nkeep + 1)
            counter += nkeep + 1
            self._P_builder.add_block(dofs, cols, p_loc)
            cdof.set_n_ranget(codim, iae, 1)
            cdof.set_n_null(codim, iae, nkeep)
            self.Pi[jform].create_dof_functional(codim, iae, p_loc, Mloc)
            coarse_dofs_lists.append(cols)
            coarse_blocks.append(cmass)

        cdof.finalize_codim(codim)
        self._P_ncols = counter
        self._refresh_P()
        self.coarser.M[(codim, jform)] = LocalMass(
            coarse_dofs_lists, coarse_blocks)

    def _compute_0form_traces(self, cdof, pv):
        """Vertex picks (Compute0formCoarseTraces, DeRhamSequence.cpp:1521)."""
        codim = self.dim
        AE_e = self.topo.AEntity_entity[codim].tocsr()
        n_ae = AE_e.shape[0]
        dofs_lists, blocks = [], []
        for iae in range(n_ae):
            row = AE_e.indices[AE_e.indptr[iae]:AE_e.indptr[iae + 1]]
            assert row.size == 1, \
                "agglomerated peak with != 1 vertex (topology error)"
            self._P_builder.add_entries([row[0]], [iae], [1.0])
            cdof.set_n_ranget(codim, iae, 1)
            self.Pi[0].create_dof_functional(
                codim, iae, np.ones((1, 1)), np.ones((1, 1)))
            dofs_lists.append(np.array([iae]))
            blocks.append(np.ones((1, 1)))
        cdof.finalize_codim(codim)
        self._P_ncols = n_ae
        self._refresh_P()
        self.coarser.M[(codim, 0)] = LocalMass(dofs_lists, blocks)

    def _refresh_P(self):
        self._P_snapshot = self._P_builder.tocsr(
            (self._P_nrows, self._P_ncols))

    # ------------------------------------------------------------------ #
    # stages 2+3: harmonic extensions
    # ------------------------------------------------------------------ #
    def _extension(self, jform, codim_dom, use_lagrange, with_nulls=True):
        """Extend the coarse space of `jform` into the interiors of
        agglomerated entities of codim_dom.

        use_lagrange=True  -> hFacetExtension system with PV Lagrange
                              multiplier; coarse-D rows from the multiplier.
        use_lagrange=False -> hRidgePeakExtension system [M B^T; B -C] with
                              the W*(P_{j+1} D_c) compatibility term;
                              with_nulls chooses the hRidge (target nulls)
                              vs hPeak (no nulls) variant.
        """
        cdof = self.coarser.dof[jform]
        pdof = self.coarser.dof[jform + 1]
        cdof.init_codim(codim_dom)

        uagg = self.dofagg[jform]
        pagg = self.dofagg[jform + 1]
        AE_e = self.topo.AEntity_entity[codim_dom]
        Md = assemble_agglomerate_blocks(
            self.M[(codim_dom, jform)], AE_e, uagg, codim_dom)
        Wd = assemble_agglomerate_blocks(
            self.M[(codim_dom, jform + 1)], AE_e, pagg, codim_dom)
        D = self.D[jform].tocsr()
        Pp = self.P[jform + 1]
        targets = self.targets[jform]
        n_targets = targets.shape[1] if targets is not None else 0
        loc_tars = self.local_targets.get((codim_dom, jform))

        if not use_lagrange:
            # coarse-derivative image in the fine jform+1 space
            Dc = self._D_builder.tocsr(
                (pdof.ndofs, self._P_ncols))
            PDc = (Pp[:, :pdof.ndofs] @ Dc).tocsr()
            D2 = self.D[jform + 1].tocsr()
            w2agg = self.dofagg[jform + 2]
            W2d = assemble_agglomerate_blocks(
                self.M[(codim_dom, jform + 2)], AE_e, w2agg, codim_dom)

        n_ae = len(Md)
        counter = self._P_ncols
        mass_dofs, mass_blocks = [], []

        # ---- pass 0 (host): batched extraction of all per-AE blocks ----- #
        # one native call per block family instead of one per agglomerate
        ae_u = uagg.ae_dofs(codim_dom)
        ae_p = pagg.ae_dofs(codim_dom)
        nu_ints = uagg.n_interior(codim_dom)
        np_ints = pagg.n_interior(codim_dom)
        u_bdrs = [ae_u[i][int(nu_ints[i]):] for i in range(n_ae)]
        p_ints = [ae_p[i][:int(np_ints[i])] for i in range(n_ae)]
        cbdrs = [cdof.dofs_on_bdr(codim_dom, i) for i in range(n_ae)]
        p_nulls_l = [pdof.null_dofs(codim_dom, i) for i in range(n_ae)]
        Dlocs = C.extract_submatrix_many(D, ae_p, ae_u)
        Pbs = C.extract_submatrix_many(self._P_snapshot, u_bdrs, cbdrs)
        cPs = C.extract_submatrix_many(Pp, p_ints, p_nulls_l)
        if use_lagrange:
            pv_cdofs = [pdof.ranget_dofs(codim_dom, i) for i in range(n_ae)]
            ploc_pvs = C.extract_submatrix_many(Pp, p_ints, pv_cdofs)
        else:
            ae_e2 = w2agg.ae_dofs(codim_dom)
            D2locs = C.extract_submatrix_many(D2, ae_e2, ae_p)
            dPcs = C.extract_submatrix_many(PDc, ae_p, cbdrs)

        # ---- pass 1 (host): gather per-AE systems and right-hand sides --- #
        recs = []
        for iae in range(n_ae):
            u_all = ae_u[iae]
            nu_int = int(nu_ints[iae])
            u_int, u_bdr = u_all[:nu_int], u_all[nu_int:]
            p_all = ae_p[iae]
            np_int = int(np_ints[iae])
            p_int = p_all[:np_int]

            Mloc = Md[iae]
            Wloc = Wd[iae]
            Dloc = Dlocs[iae]
            Bloc = Wloc @ Dloc                      # (p_all x u_all)
            M_ii = Mloc[:nu_int, :nu_int]
            M_ib = Mloc[:nu_int, nu_int:]
            B_ii = Bloc[:np_int, :nu_int]
            B_ib = Bloc[:np_int, nu_int:]
            W_ii = Wloc[:np_int, :np_int]

            # ---- local system ---- #
            pv_cdof = None
            if use_lagrange:
                pv_cdof = pv_cdofs[iae]
                assert pv_cdof.size == 1
                ploc_pv = ploc_pvs[iae].ravel()
                Tvec = W_ii @ ploc_pv
                nsys = nu_int + np_int + 1
                A = np.zeros((nsys, nsys))
                A[:nu_int, :nu_int] = M_ii
                A[nu_int:nu_int + np_int, :nu_int] = B_ii
                A[:nu_int, nu_int:nu_int + np_int] = B_ii.T
                A[-1, nu_int:nu_int + np_int] = Tvec
                A[nu_int:nu_int + np_int, -1] = Tvec
            else:
                D2loc = D2locs[iae]
                Cloc = D2loc[:, :np_int].T @ W2d[iae] @ D2loc[:, :np_int]
                nsys = nu_int + np_int
                A = np.zeros((nsys, nsys))
                A[:nu_int, :nu_int] = M_ii
                A[nu_int:, :nu_int] = B_ii
                A[:nu_int, nu_int:] = B_ii.T
                A[nu_int:, nu_int:] = -Cloc
            # reference semantics: the Lagrange system is always factored
            # (FacetSaddlePoint ctor); the [M B^T; B -C] system only when
            # there are interior u dofs (RidgePeakSaddlePoint + the
            # GetLocalOffsets(1) != 0 guards in hRidgePeakExtension)
            # a Lagrange system with empty u interior is singular (the p-p
            # block is zero); the multiplier is then determined directly by
            # T lambda = rhs_p in pass 3 (degenerate case from pinched
            # separators — the reference aborts here)
            do_solve = nu_int > 0 and nsys > 0

            # ---- rhs blocks: [trace ext | RangeT bubbles | Null targets] - #
            cbdr = cbdrs[iae]
            Pb = Pbs[iae]
            rhs_ext = np.zeros((nsys, cbdr.size))
            rhs_ext[:nu_int] = -M_ib @ Pb
            rhs_ext[nu_int:nu_int + np_int] = -B_ib @ Pb
            if not use_lagrange:
                rhs_ext[nu_int:nu_int + np_int] += \
                    Wloc[:np_int, :] @ dPcs[iae]

            p_nulls = p_nulls_l[iae]
            n_rt = p_nulls.size
            if nu_int == 0:
                # pinched entity (e.g. promoted shared-vertex separator
                # leaves a facet/ridge with empty u interior): no interior
                # dofs can carry the RangeT bubble — create none, instead
                # of the reference's implicit zero column (its sharedvertex
                # lanes fail outright, testsuite CMakeLists.txt:94-109)
                n_rt = 0
                p_nulls = p_nulls[:0]
            rhs_rt = np.zeros((nsys, n_rt))
            if n_rt:
                rhs_rt[nu_int:nu_int + np_int] = W_ii @ cPs[iae]

            lt = loc_tars[iae] if loc_tars is not None else None
            n_tars_ae = n_targets + (lt.shape[1] if lt is not None else 0)
            t_int = np.zeros((nu_int, 0))
            if with_nulls and nu_int > n_rt and n_tars_ae:
                t_int = targets[u_int, :] if n_targets else np.zeros(
                    (nu_int, 0))
                t_bdr = targets[u_bdr, :] if n_targets else np.zeros(
                    (u_bdr.size, 0))
                if lt is not None and lt.shape[1]:
                    # local target rows follow the interior-first AE order
                    # (PartitionLocalTargets, DeRhamSequence.cpp:2087-2112)
                    t_int = np.concatenate([t_int, lt[:nu_int]], axis=1)
                    t_bdr = np.concatenate([t_bdr, lt[nu_int:]], axis=1)
                rhs_null = np.zeros((nsys, t_int.shape[1]))
                rhs_null[:nu_int] = -M_ib @ t_bdr
                rhs_null[nu_int:nu_int + np_int] = B_ii @ t_int
            else:
                rhs_null = np.zeros((nsys, 0))

            recs.append(dict(
                u_all=u_all, u_int=u_int, nu_int=nu_int, cbdr=cbdr, Pb=Pb,
                A=A, do_solve=do_solve, pv_cdof=pv_cdof, p_nulls=p_nulls,
                n_rt=n_rt, t_int=t_int, Mloc=Mloc, M_ii=M_ii,
                np_int=np_int,
                Tvec=(Tvec if use_lagrange else None),
                k_ext=cbdr.size, k_rt=n_rt, k_null=rhs_null.shape[1],
                rhs=np.concatenate([rhs_ext, rhs_rt, rhs_null], axis=1)))

        # ---- pass 2 (device): one bucketed batched solve for the stage --- #
        sols = batched_solve(
            [r["A"] for r in recs if r["do_solve"]],
            [r["rhs"] for r in recs if r["do_solve"]],
            backend=self.solve_backend)
        it = iter(sols)
        full_sols = [next(it) if r["do_solve"] else r["rhs"] for r in recs]

        # pre-pass: all null-bubble SVDs in shape-grouped stacked calls
        from parelag_tpu.ops.batched import batched_plain_svd
        bub_idx, bub_mats = [], []
        for iae, r in enumerate(recs):
            if r["k_null"]:
                nu_i = r["nu_int"]
                sn = full_sols[iae][:, r["k_ext"] + r["k_rt"]:]
                bub_idx.append(iae)
                bub_mats.append(r["t_int"] - sn[:nu_i])
        bub_svds = dict(zip(bub_idx, batched_plain_svd(bub_mats)))

        # ---- pass 3 (host): scatter into P, coarse D, Pi, coarse mass --- #
        for iae, r in enumerate(recs):
            sol = full_sols[iae]
            nu_int = r["nu_int"]
            u_int, cbdr = r["u_int"], r["cbdr"]
            k_ext, k_rt, k_null = r["k_ext"], r["k_rt"], r["k_null"]
            sol_ext = sol[:, :k_ext]
            sol_rt = sol[:, k_ext:k_ext + k_rt]
            sol_null = sol[:, k_ext + k_rt:]

            if use_lagrange:
                if r["do_solve"]:
                    lam = sol_ext[-1, :]
                else:
                    # degenerate Lagrange (empty u interior): p-rows read
                    # T lambda = rhs_p, so lambda = (T . rhs_p) / (T . T)
                    T = r["Tvec"]
                    rhs_p = r["rhs"][nu_int:nu_int + r["np_int"], :k_ext]
                    tt = float(T @ T)
                    lam = (T @ rhs_p) / tt if tt > 0 else np.zeros(k_ext)
                dvals = np.where(np.abs(lam) > _EPS, -lam, 0.0)
                self._D_builder.add_entries(
                    np.full(k_ext, r["pv_cdof"][0]), cbdr, dvals)
            ext_u = sol_ext[:nu_int]
            self._P_builder.add_block(u_int, cbdr, ext_u)

            n_rt = r["n_rt"]
            rt_cols = np.arange(counter, counter + n_rt)
            counter += n_rt
            cdof.set_n_ranget(codim_dom, iae, n_rt)
            rt_basis = sol_rt[:nu_int]
            if n_rt:
                self._P_builder.add_block(u_int, rt_cols, rt_basis)
                self._D_builder.add_entries(r["p_nulls"], rt_cols,
                                            np.ones(n_rt))

            null_basis = np.zeros((nu_int, 0))
            if k_null:
                U, sv = bub_svds[iae]
                n_null = int(np.searchsorted(-sv, -self.svd_tol))
                null_basis = U[:, :n_null]
            n_null = null_basis.shape[1]
            null_cols = np.arange(counter, counter + n_null)
            counter += n_null
            cdof.set_n_null(codim_dom, iae, n_null)
            if n_null:
                self._P_builder.add_block(u_int, null_cols, null_basis)

            # ---- cochain projector functional over interior dofs ---- #
            loc_proj = np.concatenate([rt_basis, null_basis], axis=1)
            self.Pi[jform].create_dof_functional(
                codim_dom, iae, loc_proj, r["M_ii"])

            # ---- coarse mass block over [cbdr, RangeT, Null] ---- #
            nloc = k_ext + n_rt + n_null
            basis = np.zeros((r["u_all"].size, nloc))
            basis[nu_int:, :k_ext] = r["Pb"]
            basis[:nu_int, :k_ext] = ext_u
            basis[:nu_int, k_ext:k_ext + n_rt] = rt_basis
            basis[:nu_int, k_ext + n_rt:] = null_basis
            blk = basis.T @ r["Mloc"] @ basis
            mass_dofs.append(np.concatenate([cbdr, rt_cols, null_cols]))
            mass_blocks.append(0.5 * (blk + blk.T))

        cdof.finalize_codim(codim_dom)
        self._P_ncols = counter
        self._refresh_P()
        self.coarser.M[(codim_dom, jform)] = LocalMass(mass_dofs, mass_blocks)

    # ------------------------------------------------------------------ #
    def _repair_curl_range(self, jform):
        """Close the commuting gap D P_j = P_{j+1} D_c at pinched topology:
        if a coarse jform basis function's derivative has a component
        outside the coarse (jform+1) space (possible only after
        pinched-separator repairs — regular MIS topology never triggers
        this; the reference has no counterpart and its shared-vertex lanes
        simply fail, ELAG-19), append the M-orthonormalized residuals as
        extra agglomerate-interior coarse dofs of form jform+1 and extend
        P, D_c, the coarse mass and the cochain projector accordingly.
        Derivative exactness is preserved: the new functions are
        derivatives, so D_{j+1} of them vanishes."""
        jp = jform + 1
        P1, P2 = self.P[jform], self.P[jp]
        D1 = self.D[jform].tocsr()
        D1c = self.coarser.D[jform].tocsr()
        R = (D1 @ P1 - P2 @ D1c).tocsc()
        scale = max(C.max_abs((D1 @ P1).tocsr()), 1.0)
        colmax = np.zeros(R.shape[1])
        for j in range(R.shape[1]):
            seg = np.abs(R.data[R.indptr[j]:R.indptr[j + 1]])
            colmax[j] = seg.max() if seg.size else 0.0
        bad_cols = np.where(colmax > 1e-9 * scale)[0]
        if bad_cols.size == 0:
            return

        uagg = self.dofagg[jp]
        ae_dofs = uagg.ae_dofs(0)
        nu_ints = uagg.n_interior(0)
        # fine (jform+1) dof -> owning agglomerate (interior dofs only)
        n_fine = self.dof[jp].ndofs
        owner = np.full(n_fine, -1, dtype=np.int64)
        for iae in range(len(ae_dofs)):
            ints = ae_dofs[iae][: int(nu_ints[iae])]
            owner[ints] = iae

        per_ae = {}
        for j in bad_cols:
            rows = R.indices[R.indptr[j]:R.indptr[j + 1]]
            vals = R.data[R.indptr[j]:R.indptr[j + 1]]
            keep = np.abs(vals) > 1e-12 * scale
            rows, vals = rows[keep], vals[keep]
            aes = np.unique(owner[rows])
            assert (aes >= 0).all(), \
                "curl residual outside agglomerate interiors"
            for iae in aes:
                sel = owner[rows] == iae
                per_ae.setdefault(int(iae), []).append(
                    (int(j), rows[sel], vals[sel]))

        AE_e = self.topo.AEntity_entity[0]
        Md = assemble_agglomerate_blocks(
            self.M[(0, jp)], AE_e, uagg, 0)
        cdof2 = self.coarser.dof[jp]
        P2 = P2.tolil()
        extra_cols = []
        d_rows, d_cols, d_vals = [], [], []
        for iae, items in per_ae.items():
            u_all = ae_dofs[iae]
            nu_int = int(nu_ints[iae])
            u_int = u_all[:nu_int]
            pos = {int(d): i for i, d in enumerate(u_int)}
            Bres = np.zeros((nu_int, len(items)))
            cols_of = []
            for k, (j, rows, vals) in enumerate(items):
                idx = np.array([pos[int(r)] for r in rows])
                Bres[idx, k] = vals
                cols_of.append(j)
            Mloc = Md[iae]
            M_ii = Mloc[:nu_int, :nu_int]
            U, s = _weighted_svd_on(M_ii, Bres)
            nkeep = int(np.sum(s > 1e-12 * max(float(s[0]), 1.0))) \
                if s.size else 0
            if nkeep == 0:
                continue
            V = U[:, :nkeep]                       # M-orthonormal
            coeffs = V.T @ (M_ii @ Bres)           # (nkeep, n_items)
            new_ids = cdof2.append_interior_dofs(0, iae, nkeep)
            for t, nd in enumerate(new_ids):
                for k, j in enumerate(cols_of):
                    if abs(coeffs[t, k]) > 1e-13:
                        d_rows.append(nd)
                        d_cols.append(j)
                        d_vals.append(coeffs[t, k])
            extra_cols.append((u_int, new_ids, V))
            # extend the coarse mass block of this agglomerate: products of
            # every existing coarse dof on the AE with the new functions
            lm = self.coarser.M[(0, jp)]
            old_dofs = lm.dofs[iae]
            basis_old = np.asarray(
                P2[u_all.reshape(-1, 1), old_dofs.reshape(1, -1)].todense())
            Vfull = np.zeros((u_all.size, nkeep))
            Vfull[:nu_int] = V
            X = basis_old.T @ (Mloc @ Vfull)
            blk = lm.blocks[iae]
            lm.blocks[iae] = np.block(
                [[blk, X], [X.T, np.eye(nkeep)]])
            lm.dofs[iae] = np.concatenate([old_dofs, new_ids])
            # refresh the cochain functional with the enriched interior
            # basis [old interior columns | V]
            int_cols = cdof2.interior_dofs(0, iae)
            L = np.zeros((nu_int, int_cols.size))
            L[:, : int_cols.size - nkeep] = np.asarray(
                P2[u_int.reshape(-1, 1),
                   int_cols[: int_cols.size - nkeep].reshape(1, -1)]
                .todense())
            L[:, int_cols.size - nkeep:] = V
            self.Pi[jp].create_dof_functional(0, iae, L, M_ii)

        if not extra_cols:
            return
        # grow P2 with the new columns
        n_new = cdof2.ndofs - P2.shape[1]
        P2 = sp.hstack(
            [P2.tocsr(),
             sp.csr_matrix((P2.shape[0], n_new))], format="lil")
        for u_int, new_ids, V in extra_cols:
            for t, nd in enumerate(new_ids):
                P2[u_int, nd] = V[:, t]
        self.P[jp] = P2.tocsr()
        # D_c rows for the new dofs; D_{jp} gets zero columns (the new
        # functions are derivatives -> derivative-free)
        D1c = sp.csr_matrix(
            (np.concatenate([D1c.tocoo().data, d_vals]),
             (np.concatenate([D1c.tocoo().row, d_rows]),
              np.concatenate([D1c.tocoo().col, d_cols]))),
            shape=(cdof2.ndofs, D1c.shape[1]))
        self.coarser.D[jform] = D1c
        if self.coarser.D[jp] is not None:
            Dup = self.coarser.D[jp].tocoo()
            self.coarser.D[jp] = sp.csr_matrix(
                (Dup.data, (Dup.row, Dup.col)),
                shape=(Dup.shape[0], cdof2.ndofs))
        self.Pi[jp].compute_projector(self.P[jp])

    # ------------------------------------------------------------------ #
    # invariants (reference DeRhamSequence::CheckInvariants,
    # DeRhamSequence.cpp:694-970)
    # ------------------------------------------------------------------ #
    def check_invariants(self, tol=1e-9):
        errs = {}
        coarse = self.coarser
        for j in range(self.jform_start, self.nforms):
            P = self.P[j]
            Pi = self.Pi[j].matrix
            # Pi P = I
            errs[f"PiP_{j}"] = C.max_abs(
                (Pi @ P - sp.identity(P.shape[1])).tocsr())
            # coarse mass = P^T M P
            Mc = coarse.compute_mass_operator(j)
            Mf = self.compute_mass_operator(j)
            errs[f"mass_{j}"] = C.max_abs((Mc - P.T @ Mf @ P).tocsr())
        for j in range(self.jform_start, self.nforms - 1):
            P = self.P[j]
            Pi1 = self.Pi[j + 1].matrix
            Dc = coarse.D[j]
            Df = self.D[j]
            # D_c = Pi_{j+1} D_f P_j (reference CheckD,
            # DeRhamSequence.cpp:754-800)
            errs[f"D_{j}"] = C.max_abs((Dc - Pi1 @ Df @ P).tocsr())
            # interpolation commutativity D_f P_j = P_{j+1} D_c
            # (reference CheckDP, DeRhamSequence.cpp:830-856)
            errs[f"DP_{j}"] = C.max_abs(
                (Df @ P - self.P[j + 1] @ Dc).tocsr())
            # exactness
            if j < self.nforms - 2:
                errs[f"DD_{j}"] = C.max_abs((coarse.D[j + 1] @ Dc).tocsr())
        bad = {k: v for k, v in errs.items() if v > tol}
        return errs, bad


def _weighted_svd_on(M, T):
    """M-weighted SVD orthonormalization (SVD_Calculator::ComputeON with
    weight, ParELAG_SVDCalculator.cpp:248-290): returns (U, s) with
    U^T M U = I and span(U[:, :k]) = dominant-k M-subspace of span(T)."""
    d = np.diag(M).copy()
    if np.count_nonzero(M - np.diag(d)) == 0:
        sc = np.sqrt(d)
        U, s, _ = np.linalg.svd(T * sc[:, None], full_matrices=False)
        return U / sc[:, None], s
    w, V = np.linalg.eigh(M)
    w = np.maximum(w, 0.0)
    X = (V * np.sqrt(w)) @ V.T
    Xinv = (V * (1.0 / np.sqrt(np.maximum(w, 1e-300)))) @ V.T
    U, s, _ = np.linalg.svd(X @ T, full_matrices=False)
    return Xinv @ U, s
