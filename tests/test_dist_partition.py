"""Distributed multilevel k-way partitioning (ParMETIS PartKway role,
ParmetisGraphPartitioner.hpp:34): quality-competitive with the serial
multilevel partitioner from restricted per-rank data."""

import numpy as np
import pytest
import scipy.sparse as sp

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.partitioning.partitioners import (
    multilevel_graph_partition, cartesian_partition)
from parelag_tpu.parallel.dist_partition import (
    make_vertex_shards, parmetis_kway, edge_cut)

R = 4


def _grid_graph(nx, ny, nz):
    m = hex_grid_mesh(nx, ny, nz)
    topo = AgglomeratedTopology.from_mesh(m)
    A = topo.local_element_element().astype(float)
    A.setdiag(0)
    A.eliminate_zeros()
    return A


@pytest.mark.parametrize("k", [4, 8])
def test_quality_vs_serial(k):
    A = _grid_graph(12, 12, 6)
    n = A.shape[0]
    rank_of = cartesian_partition((12, 12, 6), (6, 6, 6)) % R
    shards = make_vertex_shards(A, rank_of, R)
    part = parmetis_kway(shards, k, seed=0)
    assert part.size == n and part.min() >= 0 and part.max() == k - 1

    cut_d = edge_cut(A, part)
    cut_s = edge_cut(A, multilevel_graph_partition(A, k, seed=0))
    assert cut_d <= 1.4 * cut_s, (cut_d, cut_s)

    sizes = np.bincount(part, minlength=k)
    assert sizes.max() <= 1.3 * n / k
    assert sizes.min() >= 0.5 * n / k


def test_beats_rank_local_quota_partitioning():
    """Parts may span ranks: when k does not divide the rank structure the
    old rank-local quota approach (dist_topology.distributed_partition,
    the VERDICT-flagged single pass) is forced into ~1.5x imbalance; the
    multilevel recipe stays balanced at competitive cut."""
    A = _grid_graph(8, 8, 8)
    n = A.shape[0]
    k = 6
    rank_of = cartesian_partition((8, 8, 8), (2, 8, 8))   # 4 x-slabs
    shards = make_vertex_shards(A, rank_of, R)
    part = parmetis_kway(shards, k, seed=0)
    sizes = np.bincount(part, minlength=k)
    assert sizes.max() <= 1.3 * n / k, sizes

    # rank-local with proportional quotas: 6 parts over 4 equal slabs ->
    # quotas round to >= 1 per rank and some slab keeps a whole 128-elem
    # part (1.5x the 85.3 target)
    quotas = [max(1, round(k * s.verts.size / n)) for s in shards]
    local = np.empty(n, dtype=np.int64)
    nxt = 0
    for s, q in zip(shards, quotas):
        sub = A[s.verts][:, s.verts]
        p = multilevel_graph_partition(sub, q, seed=0)
        local[s.verts] = nxt + p
        nxt += int(p.max()) + 1
    lsizes = np.bincount(local)
    # the incumbent either rounds to the wrong part COUNT (here 8 != 6)
    # or, when the count is forced, leaves ~1.5x imbalance
    assert lsizes.size != k or lsizes.max() >= 1.45 * n / k
    cut_s = edge_cut(A, multilevel_graph_partition(A, k, seed=0))
    assert edge_cut(A, part) <= 1.4 * cut_s


def test_weighted_balance():
    A = _grid_graph(10, 10, 4)
    n = A.shape[0]
    rng = np.random.RandomState(0)
    vw = 1.0 + 3.0 * (rng.rand(n) < 0.2)
    rank_of = cartesian_partition((10, 10, 4), (5, 5, 4)) % R
    shards = make_vertex_shards(A, rank_of, R, vwgt=vw)
    part = parmetis_kway(shards, 5, seed=1)
    wsum = np.zeros(5)
    np.add.at(wsum, part, vw)
    assert wsum.max() <= 1.35 * vw.sum() / 5
