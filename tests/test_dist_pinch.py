"""Fringe-aware distributed pinch repair (round-2 VERDICT item 6).

A pinched (shared-vertex) unstructured partition — the reference's
known-failing ELAG-19 lane — coarsened DISTRIBUTED over 4 ranks with
topology checking + repair enabled: the patch-local repair chain (facet
deagglomeration, degenerate Lagrange, curl-range enrichment) must
reproduce the serial coarse spaces digit-exactly, including the
enrichment dofs appended to entities whose interiors carry the curl
residual (any codim — the repair places them on the owning facet/ridge
when the residual crosses agglomerate interiors near patch fringes).
Reference protocol role: DeRhamSequence.cpp:283-424, 1818-2086.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.parallel.dist_coarsen import (
    distributed_coarsen, global_coarse_numbering, rank_P_rows)

N_RANKS = 4


def _pinched_setup():
    """6x3x3 mesh; left 3x3x3 half carries the twentyseven sharedvertex
    pattern (two AEs pinch-touching at a vertex inside a background AE),
    right half is three slab AEs on ranks 1-3. The pinch sits one AE away
    from the rank-0/rank-1 interface, so repair entities reach the
    fringes of patches 0 and 1."""
    mesh = hex_grid_mesh(6, 3, 3)
    ctr = mesh.vertices[mesh.elements].mean(axis=1)
    ne = mesh.num_elements
    ix = (ctr[:, 0] * 6).astype(int)
    iy = (ctr[:, 1] * 3).astype(int)
    iz = (ctr[:, 2] * 3).astype(int)
    eid = {(ix[e], iy[e], iz[e]): e for e in range(ne)}
    part = np.zeros(ne, dtype=np.int64)

    def lid(i):          # twentyseven numbering (x fastest) -> element id
        return eid[(i % 3, (i // 3) % 3, i // 9)]

    for i in (4, 5, 14, 23):
        part[lid(i)] = 1
    for i in (9, 18, 21, 22):
        part[lid(i)] = 2
    part[ix == 3] = 3
    part[ix == 4] = 4
    part[ix == 5] = 5
    rank = np.zeros(ne, dtype=np.int64)
    for ae, r in ((3, 1), (4, 2), (5, 3)):
        rank[part == ae] = r
    return mesh, part, rank


@pytest.fixture(scope="module")
def pinched():
    mesh, part, rank = _pinched_setup()
    topo = AgglomeratedTopology.from_mesh(mesh)
    topo.coarsen_local_partitioning(part, check_topology=True)
    assert topo.had_pinch_repair
    seq = DeRhamSequenceFE(topo, mesh)
    seq.set_upscaling_targets(0)
    seq.coarsen()
    patches, gents = distributed_coarsen(
        mesh, rank, part, N_RANKS, upscaling_order=0, check_topology=True)
    return mesh, seq, patches, gents


def test_serial_invariants_exact(pinched):
    mesh, seq, patches, gents = pinched
    errs, bad = seq.check_invariants(tol=1e-9)
    assert not bad, bad


def test_patch_repairs_fired(pinched):
    mesh, seq, patches, gents = pinched
    flags = [p.topo.had_pinch_repair for p in patches]
    # the two patches containing the pinch repaired; the far slabs did not
    assert flags[0] and flags[1]
    assert not flags[2] and not flags[3]


@pytest.mark.parametrize("form", [0, 1, 2, 3])
def test_distributed_matches_serial(pinched, form):
    """Distributed coarse dof counts AND the P column set (order-free:
    the enrichment dofs are numbered per entity, serial appends them
    globally) match the serial run exactly."""
    mesh, seq, patches, gents = pinched
    numbering = global_coarse_numbering(patches, gents, form)
    assert numbering.ndofs == seq.coarser.dof[form].ndofs

    nfine = seq.dof[form].ndofs
    rows, cols, vals = [], [], []
    for p in patches:
        r, c, v = rank_P_rows(p, gents, numbering, form, nfine)
        rows.append(r)
        cols.append(c)
        vals.append(v)
    P_dist = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(nfine, numbering.ndofs)).tocsr()

    def colsig(P):
        P = sp.csc_matrix(P)
        sigs = []
        for j in range(P.shape[1]):
            rws = P.indices[P.indptr[j]:P.indptr[j + 1]]
            dat = P.data[P.indptr[j]:P.indptr[j + 1]]
            o = np.argsort(rws)
            sigs.append((tuple(rws[o].tolist()),
                         tuple(np.round(dat[o], 10).tolist())))
        return sorted(sigs)

    assert colsig(P_dist) == colsig(seq.P[form]), \
        f"form {form}: distributed P differs from serial"
