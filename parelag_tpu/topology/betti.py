"""Agglomerate validity checking via Betti numbers.

Rebuild of AgglomeratedTopologyCheck (reference
src/topology/AgglomeratedTopologyCheck.{hpp,cpp}): for each agglomerated
entity of a codim, compute the Betti numbers of its closure sub-complex from
ranks of the restricted boundary operators:

    betti[iAE, nLower-1-i] = dim C_{i+1} - rank dB_i - rank dB_{i+1}

where dB_i = B[codim+i] restricted to the AE's entities. betti[:,0] is the
number of connected components; betti[:,1] counts tunnels; betti[:,2] holes.

An agglomerated element is bad if it is disconnected, has tunnels, or holes;
an agglomerated facet if disconnected or with holes; an agglomerated ridge if
disconnected. An additional connectivity check rejects agglomerates whose
boundary edges touch more than two boundary faces (reference
additionalTopologyCheck, AgglomeratedTopologyCheck.cpp:25-84).
"""

import numpy as np

from parelag_tpu.ops import csr as C


def compute_betti_numbers(topo, codim) -> np.ndarray:
    """(nAE, nLowerDims) matrix of Betti numbers per agglomerated entity."""
    n_lower = topo.dim - codim
    if n_lower == 0:
        return np.zeros((0, 0))

    AE_entity = [C.pattern(topo.AEntity_entity[codim])]
    for i in range(n_lower):
        AE_entity.append(C.bool_mult(AE_entity[i], topo.B[codim + i]))
    n_ae = AE_entity[0].shape[0]

    betti = np.zeros((n_ae, n_lower), dtype=np.int64)
    for iae in range(n_ae):
        ents = [m.indices[m.indptr[iae]:m.indptr[iae + 1]]
                for m in AE_entity]
        dim_k = [e.size for e in ents]
        rank_k = np.zeros(n_lower + 1, dtype=np.int64)
        for i in range(n_lower):
            if dim_k[i] == 0 or dim_k[i + 1] == 0:
                rank_k[i] = 0
            else:
                dloc = C.extract_submatrix(topo.B[codim + i],
                                           ents[i], ents[i + 1])
                sv = np.linalg.svd(dloc, compute_uv=False)
                rank_k[i] = int(np.sum(sv > 1e-9 * max(sv[0], 1.0)))
        for i in range(n_lower):
            betti[iae, n_lower - 1 - i] = (
                dim_k[i + 1] - rank_k[i] - rank_k[i + 1])
    return betti


def _additional_check(topo, codim, isbad):
    """Boundary edges of the AE boundary must belong to exactly two boundary
    faces of the AE (manifold boundary)."""
    AE_bface = C.drop_zeros(
        (topo.AEntity_entity[codim] @ topo.B[codim]).tocsr(), 1e-10)
    AE_bface = C.abs_csr(AE_bface)
    abs_face_edge = C.abs_csr(topo.B[codim + 1])
    AE_bedge = (AE_bface @ abs_face_edge).tocsr()
    for iae in range(AE_bface.shape[0]):
        rows = AE_bface.indices[AE_bface.indptr[iae]:AE_bface.indptr[iae + 1]]
        cols = AE_bedge.indices[AE_bedge.indptr[iae]:AE_bedge.indptr[iae + 1]]
        loc = C.extract_submatrix(abs_face_edge, rows, cols)
        twos = loc.sum(axis=0)
        if abs(twos.sum() - 2 * twos.size) > 1e-10:
            isbad[iae] = True
    return isbad


def mark_bad_agglomerates(topo, codim) -> np.ndarray:
    """Boolean array: which agglomerated entities of this codim are invalid
    (reference MarkBadAgglomeratedEntities)."""
    betti = compute_betti_numbers(topo, codim)
    n_ae = betti.shape[0]
    isbad = np.zeros(n_ae, dtype=bool)
    if codim == 0:
        isbad |= betti[:, 0] != 1
        for i in range(1, topo.dim):
            isbad |= betti[:, i] != 0
    elif codim == 1:
        isbad |= betti[:, 0] != 1
        for i in range(1, betti.shape[1]):
            isbad |= betti[:, i] != 0
    elif codim == 2:
        isbad |= betti[:, 0] != 1
    if topo.dim == 3 and codim in (0, 1):
        _additional_check(topo, codim, isbad)
    elif topo.dim == 2 and codim == 0:
        _additional_check(topo, codim, isbad)
    return isbad


def describe_bad_agglomerates(topo, codim):
    """Human-readable report lines (reference ShowBadAgglomeratedEntities):
    'Element i is disconnected.', 'Element i has n tunnels.',
    'Element i has n holes.', 'Facet i ...', 'Ridge i ...'."""
    betti = compute_betti_numbers(topo, codim)
    name = {0: "Element", 1: "Facet", 2: "Ridge"}[codim]
    lines = []
    for iae in range(betti.shape[0]):
        if betti[iae, 0] != 1:
            lines.append(
                f"{name} {iae} is disconnected. The number of connected "
                f"components is {betti[iae, 0]}")
        n_lower = betti.shape[1]
        for i in range(1, n_lower):
            if betti[iae, i] != 0:
                kind = "holes" if i == n_lower - 1 else "tunnels"
                if codim == 1 and i == 1:
                    kind = "holes"
                lines.append(f"{name} {iae} has {betti[iae, i]} {kind}.")
    return lines
