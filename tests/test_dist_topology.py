"""Distributed (rank-sharded) topology coarsening: the owner-computes
SharedEntityCommunication pattern over restricted per-rank data reproduces
the serial MIS grouping exactly (reference SharedEntityCommunication.hpp +
Topology.cpp:744-760)."""

import numpy as np

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.partitioning.partitioners import cartesian_partition
from parelag_tpu.parallel.dist_topology import (
    make_shards, distributed_coarsen_facets)


def _group_sets(tbl_T):
    """Set of frozensets of fine members per coarse entity (csr fine x AF)"""
    csc = tbl_T.tocsc()
    return {frozenset(csc.indices[csc.indptr[j]:csc.indptr[j + 1]])
            for j in range(csc.shape[1])
            if csc.indptr[j + 1] > csc.indptr[j]}


def test_distributed_facets_match_serial():
    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    ranks = cartesian_partition((4, 4, 4), (4, 4, 2))     # 2 ranks (z-split)
    part = cartesian_partition((4, 4, 4), (2, 2, 2))      # 8 AEs, refines
    R = int(ranks.max()) + 1

    shards, facet_owner = make_shards(topo, ranks, part.copy(), R)
    # restriction check: no rank stores non-halo facet data
    nf = topo.B[0].shape[1]
    for s in shards:
        assert s.facet_halo.size < nf

    fc_AF, AE_elem, stats = distributed_coarsen_facets(shards, R)

    t2 = AgglomeratedTopology.from_mesh(m)
    t2.coarsen_local_partitioning(part.copy())
    serial = t2.AEntity_entity[1].T.tocsr()               # fine x AF

    assert _group_sets(fc_AF) == _group_sets(serial)
    assert stats["n_af"] == serial.shape[1]
    assert stats["n_ae"] == 8
    # the interface facets really moved between ranks
    assert stats["n_msgs"] > 0 and stats["bytes_moved"] > 0
    # element agglomeration matches (up to AE renumbering)
    ae_serial = t2.AEntity_entity[0]
    got = {frozenset(AE_elem.tocsr().indices[
        AE_elem.tocsr().indptr[i]:AE_elem.tocsr().indptr[i + 1]])
        for i in range(AE_elem.shape[0])}
    want = {frozenset(ae_serial.indices[
        ae_serial.indptr[i]:ae_serial.indptr[i + 1]])
        for i in range(ae_serial.shape[0])}
    assert got == want


def test_distributed_facets_8_ranks():
    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    ranks = cartesian_partition((4, 4, 4), (2, 2, 2))     # 8 ranks
    part = cartesian_partition((4, 4, 4), (2, 2, 2))      # = rank split
    shards, _ = make_shards(topo, ranks, part.copy(), 8)
    fc_AF, AE_elem, stats = distributed_coarsen_facets(shards, 8)
    t2 = AgglomeratedTopology.from_mesh(m)
    t2.coarsen_local_partitioning(part.copy())
    assert _group_sets(fc_AF) == _group_sets(t2.AEntity_entity[1].T.tocsr())


def test_distributed_partition_and_coarsen():
    """ParMETIS-role distributed partitioning: each rank multilevel-
    partitions its local subgraph; the result refines the rank split and
    feeds the owner-computes coarsening + the serial de Rham pipeline."""
    from parelag_tpu.parallel.dist_topology import distributed_partition
    from parelag_tpu.amge.fespace import DeRhamSequenceFE

    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    ranks = cartesian_partition((4, 4, 4), (4, 4, 2))     # 2 ranks
    shards, _ = make_shards(topo, ranks, np.zeros(64, np.int64), 2)
    part = distributed_partition(shards, 8)
    assert part.min() >= 0
    # refines the rank decomposition
    for pid in np.unique(part):
        assert np.unique(ranks[part == pid]).size == 1
    # full pipeline on the distributed partition
    topo2 = AgglomeratedTopology.from_mesh(m)
    topo2.coarsen_local_partitioning(part.copy(), check_topology=True)
    seq = DeRhamSequenceFE(topo2, m)
    seq.set_upscaling_targets(0)
    seq.coarsen(svd_tol=1e-9)
    errs, bad = seq.check_invariants(tol=1e-8)
    assert not bad, (bad, errs)
