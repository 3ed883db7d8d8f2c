"""Mesh, entity, and topology-layer tests.

Mirrors the reference's topology testsuite strategy
(testsuite/{topology,coarseningTopology,twentyseven}.cpp): chain-complex
identities B@B == 0 at every level, entity counts on structured grids,
coarsening invariants, Betti-number detection of pathological agglomerates.
"""

import numpy as np
import pytest

from parelag_tpu.mesh.mesh import hex_grid_mesh, read_mesh
from parelag_tpu.mesh.entities import derive_entities
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.topology.betti import (
    compute_betti_numbers, mark_bad_agglomerates, describe_bad_agglomerates)
from parelag_tpu.partitioning.partitioners import (
    refined_mesh_partition, cartesian_partition, graph_partition,
    geometric_box_partition)
from parelag_tpu.ops import csr as C


def test_hex_grid_counts():
    m = hex_grid_mesh(2, 2, 2)
    assert m.num_vertices == 27
    assert m.num_elements == 8
    ents = derive_entities(m)
    assert ents.num_edges == 54   # 3 * 3*3*2
    assert ents.num_faces == 36   # 3 * 3*2*2... (2*2*3 per direction * 3)
    assert m.bdr_faces.shape[0] == 24


def test_chain_complex_fine():
    m = hex_grid_mesh(3, 2, 4)
    e = derive_entities(m)
    assert C.max_abs((e.B0 @ e.B1).tocsr()) == 0.0
    assert C.max_abs((e.B1 @ e.B2).tocsr()) == 0.0
    # every interior face shared by exactly 2 elements w/ opposite signs
    colsum = np.abs(e.B0).sum(axis=0).A1 if hasattr(
        np.abs(e.B0).sum(axis=0), "A1") else np.asarray(
        np.abs(e.B0).sum(axis=0)).ravel()
    assert set(np.unique(colsum)) <= {1.0, 2.0}


def test_refinement_conforming():
    m = hex_grid_mesh(2, 2, 2)
    r = m.uniform_refinement()
    assert r.num_elements == 64
    assert r.num_vertices == 125  # 5^3 conforming grid
    e = derive_entities(r)
    assert C.max_abs((e.B0 @ e.B1).tocsr()) == 0.0
    assert C.max_abs((e.B1 @ e.B2).tocsr()) == 0.0
    # children contiguous per parent: elements 8k..8k+7 all inside parent box
    for parent in range(8):
        kids = r.elements[8 * parent:8 * parent + 8]
        c = r.vertices[kids.reshape(-1)].reshape(-1, 3)
        pv = m.vertices[m.elements[parent]]
        assert c.min() >= pv.min() - 1e-12
        assert (c.min(axis=0) >= pv.min(axis=0) - 1e-12).all()
        assert (c.max(axis=0) <= pv.max(axis=0) + 1e-12).all()


def test_coarsen_topology_derefinement():
    m = hex_grid_mesh(2, 2, 2).uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    part = refined_mesh_partition(64, 8)
    coarse = topo.coarsen_local_partitioning(part)
    # coarse topology of a 2x2x2 grid
    assert coarse.num_entities(0) == 8
    assert coarse.num_entities(1) == 36
    assert coarse.num_entities(2) == 54
    assert coarse.num_entities(3) == 27
    assert C.max_abs((coarse.B[0] @ coarse.B[1]).tocsr()) == 0.0
    assert C.max_abs((coarse.B[1] @ coarse.B[2]).tocsr()) == 0.0
    # coarse facet-bdr table: 4 fine bdr faces per coarse bdr face, 24 total
    assert coarse.facet_bdr_attribute.shape == (36, 6)
    assert coarse.facet_bdr_attribute.nnz == 24
    # weights: each coarse element has 8 fine elements
    assert (coarse.weights[0] == 8).all()


def test_coarsen_twice():
    m = hex_grid_mesh(2, 2, 2).uniform_refinement().uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    t1 = topo.coarsen_local_partitioning(refined_mesh_partition(512, 64))
    t2 = t1.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    assert t2.num_entities(0) == 8
    assert t2.num_entities(3) == 27
    assert C.max_abs((t2.B[0] @ t2.B[1]).tocsr()) == 0.0
    assert C.max_abs((t2.B[1] @ t2.B[2]).tocsr()) == 0.0


def test_betti_good_agglomerates():
    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    part = cartesian_partition((4, 4, 4), (2, 2, 2))
    topo.coarsen_local_partitioning(part)
    betti = compute_betti_numbers(topo, 0)
    assert (betti[:, 0] == 1).all()
    assert (betti[:, 1:] == 0).all()
    assert not mark_bad_agglomerates(topo, 0).any()


def test_betti_disconnected():
    """Two far-apart elements in one 'agglomerate' -> disconnected
    (reference twentyseven.cpp 'disconnected' partition)."""
    m = hex_grid_mesh(3, 3, 3)
    topo = AgglomeratedTopology.from_mesh(m)
    part = np.ones(27, dtype=np.int64)
    part[0] = 0
    part[26] = 0
    # connectedComponents splits part 0 into 2 components -> 3 parts total
    coarse = topo.coarsen_local_partitioning(part)
    assert coarse.num_entities(0) == 3


def test_betti_donut():
    """Ring of 8 elements around the center column -> one tunnel
    (reference twentyseven.cpp 'donut')."""
    m = hex_grid_mesh(3, 3, 3)
    topo = AgglomeratedTopology.from_mesh(m)
    # middle z-layer: elements 9..17; ring = those minus center 13
    part = np.zeros(27, dtype=np.int64)
    ring = [9, 10, 11, 12, 14, 15, 16, 17]
    for e in ring:
        part[e] = 1
    # put everything else in singletons to keep ring as its own AE
    nxt = 2
    for e in range(27):
        if e not in ring and e != 0:
            part[e] = nxt
            nxt += 1
    topo2 = AgglomeratedTopology.from_mesh(m)
    topo2.coarsen_local_partitioning(part)
    betti = compute_betti_numbers(topo2, 0)
    # find the ring AE (weight 8)
    ring_ae = int(np.nonzero([
        topo2.AEntity_entity[0].indptr[a + 1] -
        topo2.AEntity_entity[0].indptr[a] == 8
        for a in range(topo2.AEntity_entity[0].shape[0])])[0][0])
    assert betti[ring_ae, 0] == 1
    assert betti[ring_ae, 1] == 1  # one tunnel
    lines = describe_bad_agglomerates(topo2, 0)
    assert any("1 tunnels" in ln for ln in lines)


def test_betti_void():
    """26 elements around a missing center -> one hole
    (reference twentyseven.cpp 'void')."""
    m = hex_grid_mesh(3, 3, 3)
    topo = AgglomeratedTopology.from_mesh(m)
    part = np.zeros(27, dtype=np.int64)
    part[13] = 1  # center alone
    topo.coarsen_local_partitioning(part)
    betti = compute_betti_numbers(topo, 0)
    shell_ae = 0 if topo.AEntity_entity[0].indptr[1] == 26 else 1
    assert betti[shell_ae, 0] == 1
    assert betti[shell_ae, 2] == 1  # one hole
    lines = describe_bad_agglomerates(topo, 0)
    assert any("1 holes" in ln for ln in lines)


def test_graph_partition_balanced_contiguous():
    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    ee = topo.local_element_element()
    part = graph_partition(ee, 8, seed=0)
    sizes = np.bincount(part)
    assert sizes.size == 8
    assert sizes.min() >= 4 and sizes.max() <= 12
    coarse = topo.coarsen_local_partitioning(part)
    assert C.max_abs((coarse.B[0] @ coarse.B[1]).tocsr()) == 0.0


def test_geometric_box_partition():
    """Reference formula: per-dir box count = round(extent / (vol/n)^(1/3))
    (GeometricBoxPartitioner.cpp:31-41): 8 elems, 8 boxes -> identity-ish."""
    m = hex_grid_mesh(4, 4, 4)
    part = geometric_box_partition(m, 8)
    assert np.unique(part).size == 8
    assert (np.bincount(part) == 8).all()


def test_netgen_reader():
    m = read_mesh("/root/reference/meshes/cube456.mesh")
    assert m.kind == "tet"
    assert m.num_vertices == 141
    e = derive_entities(m)
    assert C.max_abs((e.B0 @ e.B1).tocsr()) == 0.0
    assert C.max_abs((e.B1 @ e.B2).tocsr()) == 0.0


def test_coarse_facets_algo2_matches_mis_on_cartesian():
    """coarsefaces_algo=2 (one coarse facet per agglomerate pair /
    per (AE, bdr attr) pair — reference ComputeCoarseFacets,
    Topology.cpp:455-662). On a Cartesian partition of a structured grid the
    pair-based grouping must coincide with the MIS grouping up to ordering."""
    m = hex_grid_mesh(4, 4, 4)
    part = cartesian_partition((4, 4, 4), (2, 2, 2))

    t_mis = AgglomeratedTopology.from_mesh(m)
    c_mis = t_mis.coarsen_local_partitioning(part.copy())
    t_a2 = AgglomeratedTopology.from_mesh(m)
    c_a2 = t_a2.coarsen_local_partitioning(part.copy(), coarsefaces_algo=2)

    assert c_a2.num_entities(1) == c_mis.num_entities(1)
    # identical grouping up to coarse-facet permutation and sign
    mis = t_mis.AEntity_entity[1]
    a2 = t_a2.AEntity_entity[1]
    groups_mis = {frozenset(mis.indices[mis.indptr[i]:mis.indptr[i + 1]])
                  for i in range(mis.shape[0])}
    groups_a2 = {frozenset(a2.indices[a2.indptr[i]:a2.indptr[i + 1]])
                 for i in range(a2.shape[0])}
    assert groups_mis == groups_a2
    # every non-interior fine facet in exactly one coarse facet (facets
    # interior to an agglomerate belong to none; same coverage as MIS)
    cover = np.diff(a2.T.tocsr().indptr)
    assert cover.max() == 1 and cover.sum() == mis.nnz
    # chain complex survives
    assert C.max_abs((c_a2.B[0] @ c_a2.B[1]).tocsr()) == 0.0
    assert C.max_abs((c_a2.B[1] @ c_a2.B[2]).tocsr()) == 0.0
    assert c_a2.facet_bdr_attribute.nnz == c_mis.facet_bdr_attribute.nnz


def test_coarse_facets_algo2_lumps_pair_interface():
    """Unlike MIS, algo 2 lumps ALL facets between one agglomerate pair into
    ONE coarse facet, and all boundary facets of one (AE, attribute) pair
    into one — verified on a 2-agglomerate split."""
    m = hex_grid_mesh(2, 2, 2)
    topo = AgglomeratedTopology.from_mesh(m)
    part = np.array([0, 1, 0, 1, 0, 1, 0, 1])  # x-interleaved -> 1 interface
    coarse = topo.coarsen_local_partitioning(part, coarsefaces_algo=2)
    a2 = topo.AEntity_entity[1]
    sizes = np.diff(a2.indptr)
    # inner AF first: the full 2x2 interface wall (4 fine facets)
    assert sizes[0] == 4
    # boundary AFs, one per (AE, attribute) pair: each 1x2x2 slab touches
    # 5 of the 6 attributes (z0,y0,y1,z1 shared by both + its own x side)
    # -> 10 boundary AFs of size 2 (shared sides) or 4 (own x side)
    assert a2.shape[0] == 11
    assert sorted(sizes[1:]) == [2] * 8 + [4, 4]
    assert sizes[1:].sum() == 24  # all 24 boundary facets covered


def test_multilevel_graph_partition():
    """Multilevel heavy-edge-matching partitioner (the METIS recipe,
    MetisGraphPartitioner.cpp): better cut than the greedy grower at equal
    balance constraints; deterministic; all parts populated."""
    import scipy.sparse as sp
    from parelag_tpu.partitioning.partitioners import (
        graph_partition, multilevel_graph_partition)
    m = hex_grid_mesh(2, 2, 2)
    for _ in range(3):
        m = m.uniform_refinement()        # 4096 elements
    topo = AgglomeratedTopology.from_mesh(m)
    G = topo.local_element_element()

    def cut(part):
        coo = sp.csr_matrix(G).tocoo()
        return int(((part[coo.row] != part[coo.col])
                    & (coo.row < coo.col)).sum())

    p_ml = multilevel_graph_partition(G, 8, seed=0)
    p_gr = graph_partition(G, 8, seed=0)
    assert np.array_equal(p_ml, multilevel_graph_partition(G, 8, seed=0))
    sizes = np.bincount(p_ml, minlength=8)
    assert sizes.min() > 0
    assert sizes.max() <= 1.3 * sizes.mean()
    # multilevel wins where it matters (large graphs); on tiny graphs the
    # one-shot greedy grower can be equal or better
    assert cut(p_ml) < cut(p_gr)
