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

    def concatenated(self):
        """Cached flat layout (dof_cat, dof_off, blk_cat, blk_off) for the
        native batched assembler."""
        if not hasattr(self, "_cat"):
            n = len(self.dofs)
            dof_off = np.zeros(n + 1, np.int64)
            blk_off = np.zeros(n + 1, np.int64)
            np.cumsum([d.size for d in self.dofs], out=dof_off[1:])
            np.cumsum([b.size for b in self.blocks], out=blk_off[1:])
            dof_cat = (np.concatenate(self.dofs).astype(np.int64)
                       if n else np.zeros(0, np.int64))
            blk_cat = (np.concatenate([b.reshape(-1) for b in self.blocks])
                       .astype(np.float64) if n else np.zeros(0))
            self._cat = (np.ascontiguousarray(dof_cat), dof_off,
                         np.ascontiguousarray(blk_cat), blk_off)
        return self._cat

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
    from parelag_tpu.ops import native
    AE_e = ae_entity.tocsr()
    ndofs = dofagg.dof.ndofs
    pos = _col_scratch(ndofs)
    n_ae = AE_e.shape[0]
    ae_dofs_list = dofagg.ae_dofs(codim)

    if native.available():
        # one native call for the whole stage
        dof_cat, dof_off, blk_cat, blk_off = local_mass.concatenated()
        ae_off = np.zeros(n_ae + 1, np.int64)
        out_off = np.zeros(n_ae + 1, np.int64)
        sizes = np.fromiter((d.size for d in ae_dofs_list), np.int64, n_ae)
        np.cumsum(sizes, out=ae_off[1:])
        np.cumsum(sizes * sizes, out=out_off[1:])
        ae_cat = (np.ascontiguousarray(
            np.concatenate(ae_dofs_list).astype(np.int64))
            if n_ae else np.zeros(0, np.int64))
        out_cat = np.zeros(int(out_off[-1]))
        native.assemble_agglomerate_blocks_var(
            AE_e.indices.astype(np.int64), AE_e.indptr.astype(np.int64),
            dof_cat, dof_off, blk_cat, blk_off, ae_cat, ae_off, pos,
            out_cat, out_off)
        return [out_cat[out_off[i]:out_off[i + 1]].reshape(
            int(sizes[i]), int(sizes[i])) for i in range(n_ae)]

    out = []
    for iae in range(n_ae):
        ents = AE_e.indices[AE_e.indptr[iae]:AE_e.indptr[iae + 1]]
        ae_dofs = ae_dofs_list[iae]
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
