"""Per-entity local mass matrix containers.

The reference stores M_[(codim,form)] as block-diagonal sparse matrices over
"repeated dofs" (DeRhamSequence.hpp:614-727, ElementalMatricesContainer). We
store the same data as (entity dof lists, dense blocks) pairs — directly
consumable by batched device kernels and by the agglomerate assembly below.
"""

import numpy as np
import scipy.sparse as sp


class LocalMass:
    """Local mass matrices of one form on all entities of one codim."""

    def __init__(self, dofs, blocks):
        self.dofs = [np.asarray(d) for d in dofs]      # per entity dof ids
        self.blocks = [np.asarray(b) for b in blocks]  # per entity (k,k)

    @property
    def n_entities(self):
        return len(self.dofs)

    def assemble_global(self, ndofs) -> sp.csr_matrix:
        """Scatter-add all blocks into the global (ndofs x ndofs) matrix
        (reference ComputeMassOperator)."""
        rows, cols, vals = [], [], []
        for d, b in zip(self.dofs, self.blocks):
            k = d.size
            rows.append(np.repeat(d, k))
            cols.append(np.tile(d, k))
            vals.append(b.reshape(-1))
        A = sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(ndofs, ndofs))
        return A.tocsr()


def assemble_agglomerate_blocks(local_mass: LocalMass, ae_entity,
                                dofagg, codim):
    """Per-AE dense matrices: sum of member entities' local blocks scattered
    into the AE's closure-dof positions.

    Equivalent of AssembleAgglomerateMatrix (DOFAgglomeration.cpp:533-547)
    which computes ADof_rDof * M_e * ADof_rDof^T; here directly:
    for AE: M_AE[pos(i),pos(j)] += M_loc_e[i,j] for each fine entity e in AE.

    Returns list of (n_ae_dofs x n_ae_dofs) dense arrays aligned with
    dofagg.ae_dofs(codim)[iae].
    """
    from parelag_tpu.ops.csr import _col_scratch
    AE_e = ae_entity.tocsr()
    ndofs = dofagg.dof.ndofs
    pos = _col_scratch(ndofs)
    out = []
    for iae in range(AE_e.shape[0]):
        ents = AE_e.indices[AE_e.indptr[iae]:AE_e.indptr[iae + 1]]
        ae_dofs = dofagg.ae_dofs(codim)[iae]
        n = ae_dofs.size
        pos[ae_dofs] = np.arange(n)
        M = np.zeros((n, n))
        for e in ents:
            idx = pos[local_mass.dofs[e]]
            blk = local_mass.blocks[e]
            # scatter-add (duplicates impossible within one entity block)
            M[idx[:, None], idx[None, :]] += blk
        pos[ae_dofs] = -1
        out.append(M)
    return out
