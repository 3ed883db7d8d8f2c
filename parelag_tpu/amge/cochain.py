"""Cochain projector Pi: coarse <- fine, with Pi P = I.

Rebuild of reference src/amge/CochainProjector.{hpp,cpp}: per coarse entity a
"dof linear functional" F = (L^T M L)^{-1} (M L)^T where L is the local coarse
basis restricted to the entity's interior fine dofs and M the interior local
mass (CochainProjector.hpp:91-96, CochainProjector.cpp:53-145). The assembled
sparse projector follows the telescoping recursion

    Pi_{codim_base} = hat(Pi)_{codim_base}
    Pi_{codim-1}    = Pi_codim + hat(Pi)_{codim-1} (I - P Pi_codim)

(CochainProjector::ComputeProjector, CochainProjector.cpp:218-316).
"""

import numpy as np
import scipy.sparse as sp

from parelag_tpu.ops import csr as C


class CochainProjector:
    def __init__(self, cdof, dofagg):
        self.cdof = cdof          # DofHandlerALG of the coarse level
        self.dofagg = dofagg      # fine DofAgglomeration of the form
        self.functionals = {}     # (codim, ient) -> (ncoarse_int x nfine_int)
        self.matrix = None

    def create_dof_functional(self, codim, ient, local_projector, M_ii):
        """local_projector: (nfine_int x ncoarse_int) coarse basis columns on
        the entity's interior fine dofs; M_ii: interior local mass."""
        L = np.asarray(local_projector)
        if L.shape[1] == 0:
            self.functionals[(codim, ient)] = np.zeros((0, L.shape[0]))
            return
        ML = M_ii @ L
        G = L.T @ ML
        F = np.linalg.solve(G, ML.T)
        assert np.all(np.isfinite(F)), \
            f"singular local Gram matrix at codim {codim} entity {ient}"
        self.functionals[(codim, ient)] = F

    # ------------------------------------------------------------------ #
    def _hat_pi(self, codim, nfine) -> sp.csr_matrix:
        b = C.coo_builder()
        n_ent = self.cdof.topo.num_entities(codim)
        for ient in range(n_ent):
            F = self.functionals.get((codim, ient))
            if F is None or F.shape[0] == 0:
                continue
            crows = self.cdof.interior_dofs(codim, ient)
            fine = self.dofagg.interior_dofs(codim, ient)
            b.add_block(crows, fine, F)
        return b.tocsr((self.cdof.ndofs, nfine))

    def compute_projector(self, P: sp.csr_matrix):
        nfine = P.shape[0]
        max_codim = self.cdof.max_codim
        Pi = self._hat_pi(max_codim, nfine)
        for codim in range(max_codim - 1, -1, -1):
            hat = self._hat_pi(codim, nfine)
            Pi = (Pi + hat @ (sp.identity(nfine, format="csr") - P @ Pi)
                  ).tocsr()
        self.matrix = Pi
        return Pi

    def project(self, v) -> np.ndarray:
        """Project fine (ndofs, k) multivector to coarse."""
        v = np.asarray(v)
        if self.matrix is None:
            raise RuntimeError("call compute_projector first")
        return self.matrix @ v
