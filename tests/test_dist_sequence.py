"""Distributed trace stage (sequence-level SharedEntityCommunication,
reference DeRhamSequence.cpp:1723-2000): owner-computed coarse facet
traces are digit-identical to the serial stage."""

import numpy as np
import scipy.sparse as sp

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import cartesian_partition
from parelag_tpu.parallel.dist_sequence import distributed_facet_traces


def test_distributed_facet_traces_match_serial():
    m = hex_grid_mesh(4, 4, 4)
    ranks = cartesian_partition((4, 4, 4), (4, 4, 2))      # 2 ranks
    part = cartesian_partition((4, 4, 4), (2, 2, 2))       # 8 AEs

    # serial twin
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(part.copy())
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen(svd_tol=1e-9)

    # distributed stage on a fresh sequence with the same topology tables
    topo2 = AgglomeratedTopology.from_mesh(m)
    topo2.coarsen_local_partitioning(part.copy())
    seq2 = DeRhamSequenceFE(topo2, m)
    seq2.set_upscaling_targets(0)
    seq2.agglomerate_dofs()
    seq2.svd_tol = 1e-9
    fc_AF = topo2.AEntity_entity[1].T.tocsr()
    results, stats = distributed_facet_traces(
        seq2, 2, fc_AF, ranks, 2, svd_tol=1e-9)
    assert stats["n_af"] == topo2.AEntity_entity[1].shape[0]
    # interface coarse facets between the 2 ranks were broadcast
    assert stats["n_msgs"] > 0

    # serial per-facet trace blocks: rows = facet dofs, cols = the coarse
    # facet's codim-1 interior dofs (RangeT + Null)
    cdof = coarse.dof[2]
    uagg = seq.dofagg[2]
    P = sp.csc_matrix(seq.P[2])
    for r in results:
        iae = r.facet
        dofs_serial = uagg.ae_dofs(1)[iae]
        cols = np.concatenate([cdof.ranget_dofs(1, iae),
                               cdof.null_dofs(1, iae)])
        blk = np.asarray(P[:, cols].todense())[dofs_serial, :]
        # align distributed rows (np.unique order) to the serial dof order
        pos = {int(d): i for i, d in enumerate(r.dofs)}
        perm = np.array([pos[int(d)] for d in dofs_serial])
        got = r.p_block[perm]
        assert got.shape == blk.shape, (iae, got.shape, blk.shape)
        # columns may flip sign (SVD); compare up to per-column sign
        for c in range(blk.shape[1]):
            d1 = np.abs(got[:, c] - blk[:, c]).max()
            d2 = np.abs(got[:, c] + blk[:, c]).max()
            assert min(d1, d2) < 1e-12, (iae, c, d1, d2)
    # owners: every coarse facet owned by the min adjacent rank
    owners = {r.facet: r.owner for r in results}
    assert set(owners.values()) == {0, 1}


def test_distributed_rt_extension_matches_serial():
    """Stage 2 distributed per agglomerate owner: extension and
    null-target columns plus the coarse-D row entries are digit-identical
    to the serial hFacetExtension (up to SVD column signs)."""
    from parelag_tpu.parallel.dist_sequence import distributed_rt_extension

    m = hex_grid_mesh(4, 4, 4)
    ranks = cartesian_partition((4, 4, 4), (4, 4, 2))
    part = cartesian_partition((4, 4, 4), (2, 2, 2))

    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(part.copy())
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen(svd_tol=1e-9)

    topo2 = AgglomeratedTopology.from_mesh(m)
    topo2.coarsen_local_partitioning(part.copy())
    seq2 = DeRhamSequenceFE(topo2, m)
    seq2.set_upscaling_targets(0)
    seq2.agglomerate_dofs()
    seq2.svd_tol = 1e-9
    fc_AF = topo2.AEntity_entity[1].T.tocsr()
    traces, _ = distributed_facet_traces(seq2, 2, fc_AF, ranks, 2,
                                         svd_tol=1e-9)
    exts = distributed_rt_extension(seq2, traces, ranks, svd_tol=1e-9)

    cdof = coarse.dof[2]
    uagg = seq.dofagg[2]
    P = sp.csc_matrix(seq.P[2])
    D2c = sp.csr_matrix(coarse.D[2])
    pdof = coarse.dof[3]
    for r in exts:
        iae = r.ae
        u_int_serial = uagg.ae_dofs(0)[iae][: int(uagg.n_interior(0)[iae])]
        assert np.array_equal(np.sort(r.u_int), np.sort(u_int_serial))
        # serial extension columns = P entries at (u_int, boundary coarse
        # dofs of the AE in facet order)
        cbdr = cdof.dofs_on_bdr(0, iae)
        blk = np.asarray(P[:, cbdr].todense())[r.u_int, :]
        assert r.ext.shape == blk.shape
        assert np.abs(r.ext - blk).max() < 1e-11, iae
        # null-target columns match up to sign
        ncols = cdof.null_dofs(0, iae)
        if ncols.size:
            nb = np.asarray(P[:, ncols].todense())[r.u_int, :]
            assert nb.shape == r.nulls.shape
            for c in range(nb.shape[1]):
                d1 = np.abs(r.nulls[:, c] - nb[:, c]).max()
                d2 = np.abs(r.nulls[:, c] + nb[:, c]).max()
                assert min(d1, d2) < 1e-11, (iae, c)
        # coarse D row of the AE's L2 PV against its boundary coarse dofs
        pvrow = pdof.ranget_dofs(0, iae)
        drow = np.asarray(D2c[pvrow, :].todense()).ravel()[cbdr]
        assert np.abs(drow - r.dvals).max() < 1e-11, iae
    owners = {r.ae: r.owner for r in exts}
    assert set(owners.values()) == {0, 1}


def test_assembled_distributed_P_equals_serial():
    """End-to-end: the distributed stages assemble to the SAME coarse Hdiv
    interpolation as the serial coarsening, up to the owner-order dof
    permutation and SVD column signs."""
    from parelag_tpu.parallel.dist_sequence import (
        distributed_rt_extension, assemble_distributed_P)

    m = hex_grid_mesh(4, 4, 4)
    ranks = cartesian_partition((4, 4, 4), (4, 4, 2))
    part = cartesian_partition((4, 4, 4), (2, 2, 2))

    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(part.copy())
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen(svd_tol=1e-9)

    topo2 = AgglomeratedTopology.from_mesh(m)
    topo2.coarsen_local_partitioning(part.copy())
    seq2 = DeRhamSequenceFE(topo2, m)
    seq2.set_upscaling_targets(0)
    seq2.agglomerate_dofs()
    fc_AF = topo2.AEntity_entity[1].T.tocsr()
    traces, _ = distributed_facet_traces(seq2, 2, fc_AF, ranks, 2,
                                         svd_tol=1e-9)
    exts = distributed_rt_extension(seq2, traces, ranks, svd_tol=1e-9)
    Pd, col_of_facet, ae_null = assemble_distributed_P(seq2, traces, exts)

    Ps = sp.csc_matrix(seq.P[2])
    assert Pd.shape == Ps.shape
    Pd = sp.csc_matrix(Pd)
    cdof = coarse.dof[2]
    # facet columns (coarse facet ids coincide: same topology tables)
    n_af = topo2.AEntity_entity[1].shape[0]
    for f in range(n_af):
        base, k = col_of_facet[f]
        scols = np.concatenate([cdof.ranget_dofs(1, f),
                                cdof.null_dofs(1, f)])
        assert scols.size == k
        A = np.asarray(Pd[:, base:base + k].todense())
        B = np.asarray(Ps[:, scols].todense())
        for c in range(k):
            d = min(np.abs(A[:, c] - B[:, c]).max(),
                    np.abs(A[:, c] + B[:, c]).max())
            assert d < 1e-11, (f, c, d)
    # AE null columns
    for iae, (base, k) in ae_null.items():
        scols = cdof.null_dofs(0, iae)
        assert scols.size == k
        A = np.asarray(Pd[:, base:base + k].todense())
        B = np.asarray(Ps[:, scols].todense())
        for c in range(k):
            d = min(np.abs(A[:, c] - B[:, c]).max(),
                    np.abs(A[:, c] + B[:, c]).max())
            assert d < 1e-11, (iae, c, d)


def test_distributed_ridge_traces_hcurl():
    """The same owner-computes protocol at codim 2: distributed Hcurl
    ridge traces equal the serial stage."""
    m = hex_grid_mesh(4, 4, 4)
    ranks = cartesian_partition((4, 4, 4), (4, 4, 2))
    part = cartesian_partition((4, 4, 4), (2, 2, 2))

    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(part.copy())
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen(svd_tol=1e-9)

    topo2 = AgglomeratedTopology.from_mesh(m)
    topo2.coarsen_local_partitioning(part.copy())
    seq2 = DeRhamSequenceFE(topo2, m)
    seq2.set_upscaling_targets(0)
    seq2.agglomerate_dofs()
    rg_AR = topo2.AEntity_entity[2].T.tocsr()
    results, stats = distributed_facet_traces(
        seq2, 1, rg_AR, ranks, 2, svd_tol=1e-9, codim=2)
    assert stats["n_af"] == topo2.AEntity_entity[2].shape[0]

    cdof = coarse.dof[1]
    uagg = seq.dofagg[1]
    P = sp.csc_matrix(seq.P[1])
    for r in results:
        iae = r.facet
        dofs_serial = uagg.ae_dofs(2)[iae]
        cols = np.concatenate([cdof.ranget_dofs(2, iae),
                               cdof.null_dofs(2, iae)])
        blk = np.asarray(P[:, cols].todense())[dofs_serial, :]
        pos = {int(d): i for i, d in enumerate(r.dofs)}
        perm = np.array([pos[int(d)] for d in dofs_serial])
        got = r.p_block[perm]
        assert got.shape == blk.shape
        for c in range(blk.shape[1]):
            d1 = np.abs(got[:, c] - blk[:, c]).max()
            d2 = np.abs(got[:, c] + blk[:, c]).max()
            assert min(d1, d2) < 1e-12, (iae, c)


def test_distributed_nd_facet_extension_matches_serial():
    """The Hcurl facet Lagrange stage distributed per facet owner matches
    the serial extension: boundary-extension, RangeT bubble and null
    columns plus the coarse-D row from the multiplier."""
    from parelag_tpu.parallel.dist_sequence import (
        distributed_nd_facet_extension)

    m = hex_grid_mesh(4, 4, 4)
    ranks = cartesian_partition((4, 4, 4), (4, 4, 2))
    part = cartesian_partition((4, 4, 4), (2, 2, 2))

    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(part.copy())
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen(svd_tol=1e-9)

    topo2 = AgglomeratedTopology.from_mesh(m)
    topo2.coarsen_local_partitioning(part.copy())
    seq2 = DeRhamSequenceFE(topo2, m)
    seq2.set_upscaling_targets(0)
    seq2.agglomerate_dofs()
    ridges, _ = distributed_facet_traces(
        seq2, 1, topo2.AEntity_entity[2].T.tocsr(), ranks, 2,
        svd_tol=1e-9, codim=2)
    facets, _ = distributed_facet_traces(
        seq2, 2, topo2.AEntity_entity[1].T.tocsr(), ranks, 2,
        svd_tol=1e-9, codim=1)
    exts = distributed_nd_facet_extension(seq2, ridges, facets, ranks,
                                          svd_tol=1e-9)

    cdof1 = coarse.dof[1]
    cdof2 = coarse.dof[2]
    uagg = seq.dofagg[1]
    P = sp.csc_matrix(seq.P[1])
    D1c = sp.csr_matrix(coarse.D[1])
    for r in exts:
        iaf = r.ae
        nu = int(uagg.n_interior(1)[iaf])
        u_int_serial = uagg.ae_dofs(1)[iaf][:nu]
        assert np.array_equal(r.u_int, u_int_serial)
        # extension columns
        cbdr = cdof1.dofs_on_bdr(1, iaf)
        blk = np.asarray(P[:, cbdr].todense())[r.u_int, :]
        assert np.abs(r.ext - blk).max() < 1e-11, iaf
        # RangeT bubble columns
        rts = cdof1.ranget_dofs(1, iaf)
        if rts.size:
            rb = np.asarray(P[:, rts].todense())[r.u_int, :]
            assert np.abs(r.rt - rb).max() < 1e-10, iaf
        # null columns up to sign
        ncols = cdof1.null_dofs(1, iaf)
        if ncols.size:
            nb = np.asarray(P[:, ncols].todense())[r.u_int, :]
            for c in range(nb.shape[1]):
                d = min(np.abs(r.nulls[:, c] - nb[:, c]).max(),
                        np.abs(r.nulls[:, c] + nb[:, c]).max())
                assert d < 1e-10, (iaf, c)
        # coarse-D row of the facet's Hdiv PV dof against the ND cbdr dofs
        pvrow = cdof2.ranget_dofs(1, iaf)
        drow = np.asarray(D1c[pvrow, :].todense()).ravel()[cbdr]
        assert np.abs(drow - r.dvals).max() < 1e-11, iaf
    assert {r.owner for r in exts} == {0, 1}
