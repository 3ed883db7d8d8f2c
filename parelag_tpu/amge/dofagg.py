"""Dof agglomeration: closure dofs of agglomerated entities, interior first.

Rebuild of reference src/amge/DOFAgglomeration.{hpp,cpp}: for one form and
every codim, the fine dofs contained in each agglomerated entity's closure,
ordered so that interior dofs come first (making interior extraction a
contiguous range — DOFAgglomeration.hpp:27-36). A dof's separator type is the
highest codim of agglomerated entity whose closure contains it
(DOFAgglomeration.cpp:70-85); a dof is interior to a codim-c agglomerate iff
its separator type equals c.
"""

import numpy as np

from parelag_tpu.ops import csr as C


class DofAgglomeration:
    def __init__(self, topo, dof_handler):
        """topo: fine AgglomeratedTopology with AEntity_entity built
        (i.e. coarsen_local_partitioning has been called)."""
        self.topo = topo
        self.dof = dof_handler
        max_codim = dof_handler.max_codim
        self.max_codim = max_codim

        # closure dof pattern per codim
        closure = {}
        for c in range(max_codim + 1):
            closure[c] = C.bool_mult(
                topo.AEntity_entity[c], dof_handler.entity_dof_pattern(c))

        # separator type per dof
        septype = np.zeros(dof_handler.ndofs, dtype=np.int64)
        for c in range(1, max_codim + 1):
            septype[closure[c].indices] = c
        self.septype = septype

        # interior-first ordered dof lists + interior counts
        self._ae_dofs = {}
        self._n_interior = {}
        for c in range(max_codim + 1):
            M = closure[c]
            lists, nint = [], []
            for iae in range(M.shape[0]):
                d = M.indices[M.indptr[iae]:M.indptr[iae + 1]]
                st = septype[d]
                order = np.lexsort((d, st))
                d = d[order]
                lists.append(d)
                nint.append(int(np.sum(st[order] == c)) if c < max_codim
                            else d.size)
            self._ae_dofs[c] = lists
            self._n_interior[c] = np.array(nint, dtype=np.int64)

    # ------------------------------------------------------------------ #
    def ae_dofs(self, codim):
        """List per AE: closure dof ids, interior first."""
        return self._ae_dofs[codim]

    def n_interior(self, codim):
        return self._n_interior[codim]

    def interior_dofs(self, codim, iae):
        return self._ae_dofs[codim][iae][: self._n_interior[codim][iae]]

    def bdr_dofs(self, codim, iae):
        return self._ae_dofs[codim][iae][self._n_interior[codim][iae]:]


def distribute_matrix(A, row_dofs, col_dofs) -> np.ndarray:
    """Dense restriction A[row_dofs][:, col_dofs] of a global sparse matrix
    (DistributeAgglomerateMatrix, DOFAgglomeration.cpp:606-645)."""
    return C.extract_submatrix(A, row_dofs, col_dofs)
