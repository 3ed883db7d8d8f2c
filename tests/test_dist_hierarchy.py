"""Multi-level distributed setup + solve == serial, end to end.

The reference runs recursive Coarsen and per-level RAP fully distributed
(DeRhamSequence.cpp:572-692, ParELAG_Hierarchy.cpp:282-385) and its
acceptance is serial == parallel golden output. Here we assert digit
exactness at every stage of the 3-level distributed pipeline — numbering
counts, per-level P, per-level owned operator rows — and that the
device-sharded 3-level V-cycle PCG run straight off the distributed setup
(no global fine matrix anywhere) reproduces the serial solution.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import (
    cartesian_partition, refined_mesh_partition)
from parelag_tpu.parallel.dist_hierarchy import (
    distributed_coarsen_multilevel, distributed_operator_setup,
    global_numbering_level, build_hierarchy_from_setup, distributed_rhs,
    compose_partitions)

N_RANKS = 4
FORM = 0


def _setup():
    mesh = hex_grid_mesh(8, 8, 4)                        # 256 elements
    partitions = [
        cartesian_partition((8, 8, 4), (2, 2, 2)),       # 256 -> 32 AE1
        cartesian_partition((4, 4, 2), (1, 2, 2)),       # 32  -> 8  AE2
    ]
    # AE2 grid is 4x2x1: ranks = 1x2x1 AE2 pairs, so the corner ranks are
    # NOT vertex-adjacent and patches are proper subsets of the mesh
    ae2_rank = cartesian_partition((4, 2, 1), (1, 2, 1))
    comp = compose_partitions(partitions)
    rank_of_elem = ae2_rank[comp[-1]]
    return mesh, rank_of_elem, partitions


def _patch_A(p):
    seq = p.seqs[0] if hasattr(p, "seqs") else p.seq
    M = seq.compute_mass_operator(FORM)
    W = seq.compute_mass_operator(FORM + 1)
    D = seq.D[FORM]
    return (M + D.T @ W @ D).tocsr()


@pytest.fixture(scope="module")
def dist():
    mesh, rank_of_elem, partitions = _setup()
    patches, gents = distributed_coarsen_multilevel(
        mesh, rank_of_elem, partitions, N_RANKS, upscaling_order=0)
    setup = distributed_operator_setup(
        patches, gents, FORM, _patch_A, rank_of_elem)

    # serial reference chain
    topo = AgglomeratedTopology.from_mesh(mesh)
    topo.coarsen_local_partitioning(partitions[0])
    topo.coarser.coarsen_local_partitioning(partitions[1])
    seqs = [DeRhamSequenceFE(topo, mesh)]
    seqs[0].set_upscaling_targets(0)
    seqs.append(seqs[0].coarsen())
    seqs.append(seqs[1].coarsen())
    return mesh, patches, gents, setup, seqs


def _serial_colmap(seqs, level, form, dim=3):
    """Serial level-`level` coarse dof -> distributed global id (codim desc,
    min-member-fine-entity rep asc, within-entity index)."""
    cdof = seqs[level].dof[form]
    topo = seqs[0].topo
    topos = [topo]
    while topos[-1].coarser is not None:
        topos.append(topos[-1].coarser)
    max_codim = dim - form
    out = np.full(cdof.ndofs, -1, dtype=np.int64)
    cursor = 0
    for codim in range(max_codim, -1, -1):
        pat = sp.csr_matrix(abs(topos[0].AEntity_entity[codim]))
        for lvl in range(1, level):
            pat = (sp.csr_matrix(abs(topos[lvl].AEntity_entity[codim]))
                   @ pat).tocsr()
        n = pat.shape[0]
        reps = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        rows = np.repeat(np.arange(n), np.diff(pat.indptr))
        np.minimum.at(reps, rows, pat.indices)
        o = cdof.interior_offsets[codim]
        counts = np.diff(o)
        for i in np.argsort(reps):
            out[o[i]:o[i + 1]] = cursor + np.arange(counts[i])
            cursor += counts[i]
    return out


@pytest.mark.parametrize("level", [1, 2])
def test_numbering_matches_serial_counts(dist, level):
    mesh, patches, gents, setup, seqs = dist
    num = global_numbering_level(patches, gents, FORM, level)
    assert num.ndofs == seqs[level].dof[FORM].ndofs


@pytest.mark.parametrize("level", [0, 1])
def test_published_P_matches_serial(dist, level):
    mesh, patches, gents, setup, seqs = dist
    rows, cols, vals = setup.P_published[level]
    P_dist = sp.coo_matrix(
        (vals, (rows, cols)),
        shape=(setup.ndofs[level], setup.ndofs[level + 1])).tocsr()
    P_serial = sp.csr_matrix(seqs[level].P[FORM])
    cmap_c = _serial_colmap(seqs, level + 1, FORM)
    P_serial = P_serial[:, np.argsort(cmap_c)]
    if level > 0:
        cmap_r = _serial_colmap(seqs, level, FORM)
        P_serial = P_serial[np.argsort(cmap_r)]
    d = (P_dist - P_serial).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-12


@pytest.mark.parametrize("level", [1, 2])
def test_operator_rows_match_serial(dist, level):
    mesh, patches, gents, setup, seqs = dist
    rows = np.concatenate([t[0] for t in setup.A_rows[level]])
    cols = np.concatenate([t[1] for t in setup.A_rows[level]])
    vals = np.concatenate([t[2] for t in setup.A_rows[level]])
    # every level dof is owned by exactly one rank: per-rank owned row
    # sets are disjoint and together cover [0, ndofs)
    per_rank = [np.unique(t[0]) for t in setup.A_rows[level]]
    assert sum(r.size for r in per_rank) == setup.ndofs[level]
    assert np.unique(rows).size == setup.ndofs[level]
    A_dist = sp.coo_matrix(
        (vals, (rows, cols)),
        shape=(setup.ndofs[level], setup.ndofs[level])).tocsr()
    A0 = _patch_A_serial(seqs)
    Pc = sp.csr_matrix(seqs[0].P[FORM])
    for lvl in range(1, level):
        Pc = (Pc @ sp.csr_matrix(seqs[lvl].P[FORM])).tocsr()
    Ac = (Pc.T @ A0 @ Pc).tocsr()
    perm = np.argsort(_serial_colmap(seqs, level, FORM))
    Ac = Ac[perm][:, perm]
    d = (A_dist - Ac).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-10


def _patch_A_serial(seqs):
    M = seqs[0].compute_mass_operator(FORM)
    W = seqs[0].compute_mass_operator(FORM + 1)
    D = seqs[0].D[FORM]
    return (M + D.T @ W @ D).tocsr()


def test_three_level_distributed_solve_matches_serial(dist):
    """The flagship lane: 3-level distributed V-cycle PCG executed over the
    8-device CPU mesh from the distributed setup output, vs the serial
    direct solve. No global fine matrix is formed on the distributed side;
    the coarsest (8-AE) operator is the only replicated object."""
    from parelag_tpu.parallel.sharding import (
        make_dd_mesh, distributed_mg_l_pcg)
    mesh, patches, gents, setup, seqs = dist
    hier = build_hierarchy_from_setup(setup, N_RANKS, dtype=np.float64)
    jmesh = make_dd_mesh(N_RANKS)

    rng = np.random.RandomState(3)
    b = rng.randn(setup.ndofs[0])
    x = distributed_mg_l_pcg(hier, b, jmesh, iters=25, dtype=np.float64)
    A0 = _patch_A_serial(seqs)
    xref = spla.spsolve(A0.tocsc(), b)
    assert np.abs(x - xref).max() < 1e-10 * max(np.abs(xref).max(), 1.0)


def test_distributed_rhs_assembly(dist):
    """Per-patch rhs assembly restricted to owned dofs == global assembly
    (every fine dof owned exactly once)."""
    mesh, patches, gents, setup, seqs = dist

    def b_fn(p):
        s = p.seqs[0]
        return s.domain_lf_scalar(FORM, lambda q: q[..., 0] + q[..., 1])

    b = distributed_rhs(setup, patches, b_fn)
    bref = seqs[0].domain_lf_scalar(
        FORM, lambda q: q[..., 0] + q[..., 1])
    assert np.abs(b - bref).max() < 1e-12


@pytest.mark.parametrize("form", [1, 2, 3])
@pytest.mark.parametrize("level", [1, 2])
def test_numbering_other_forms(dist, form, level):
    """The recursion is form-generic: Hcurl/Hdiv/L2 coarse spaces number
    identically at every depth."""
    mesh, patches, gents, setup, seqs = dist
    num = global_numbering_level(patches, gents, form, level)
    assert num.ndofs == seqs[level].dof[form].ndofs


@pytest.mark.parametrize("form", [1, 2])
def test_published_P_other_forms_level2(dist, form):
    from parelag_tpu.parallel.dist_hierarchy import publish_P_level
    mesh, patches, gents, setup, seqs = dist
    num1 = global_numbering_level(patches, gents, form, 1)
    num2 = global_numbering_level(patches, gents, form, 2)
    rows, cols, vals = publish_P_level(
        patches, gents, num1, num2, form, 1)
    P_dist = sp.coo_matrix(
        (vals, (rows, cols)), shape=(num1.ndofs, num2.ndofs)).tocsr()
    cmap_r = _serial_colmap(seqs, 1, form)
    cmap_c = _serial_colmap(seqs, 2, form)
    P_serial = sp.csr_matrix(seqs[1].P[form])[
        np.argsort(cmap_r)][:, np.argsort(cmap_c)]
    d = (P_dist - P_serial).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-12


def test_no_patch_holds_global(dist):
    mesh, patches, gents, setup, seqs = dist
    for p in patches:
        assert p.mesh.num_elements < mesh.num_elements
        for lvl, t in enumerate(p.topos[1:], start=1):
            assert t.num_entities(0) <= p.topos[0].num_entities(0)


def test_multilevel_distributed_ho(dist):
    """The distributed pipeline is ORDER-generic: with an arbitrary-order
    (feorder=1) fine sequence the per-level published P and owned operator
    rows stay digit-exact vs serial (gid-derived HO dof conventions
    survive the patch's monotone renumbering)."""
    from parelag_tpu.amge.fespace3d_ho import DeRhamSequence3DFE_HO
    mesh, rank_of_elem, partitions = _setup()
    patches, gents = distributed_coarsen_multilevel(
        mesh, rank_of_elem, partitions, N_RANKS, upscaling_order=0,
        seq_factory=lambda t, m: DeRhamSequence3DFE_HO(t, m, 1))

    def patch_A(p):
        s = p.seqs[0]
        M = s.compute_mass_operator(FORM)
        W = s.compute_mass_operator(FORM + 1)
        D = s.D[FORM]
        return (M + D.T @ W @ D).tocsr()

    setup = distributed_operator_setup(
        patches, gents, FORM, patch_A, rank_of_elem)

    # serial HO chain
    topo = AgglomeratedTopology.from_mesh(mesh)
    topo.coarsen_local_partitioning(partitions[0])
    topo.coarser.coarsen_local_partitioning(partitions[1])
    seqs = [DeRhamSequence3DFE_HO(topo, mesh, 1)]
    seqs[0].set_upscaling_targets(0)
    seqs.append(seqs[0].coarsen())
    seqs.append(seqs[1].coarsen())

    assert setup.ndofs[0] == seqs[0].dof[FORM].ndofs
    assert setup.ndofs[1] == seqs[1].dof[FORM].ndofs
    assert setup.ndofs[2] == seqs[2].dof[FORM].ndofs

    rows, cols, vals = setup.P_published[0]
    P_dist = sp.coo_matrix(
        (vals, (rows, cols)),
        shape=(setup.ndofs[0], setup.ndofs[1])).tocsr()
    cmap = _serial_colmap(seqs, 1, FORM)
    P_serial = sp.csr_matrix(seqs[0].P[FORM])[:, np.argsort(cmap)]
    d = (P_dist - P_serial).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-11

    # level-2 operator rows vs serial composite RAP
    rows = np.concatenate([t[0] for t in setup.A_rows[2]])
    cols = np.concatenate([t[1] for t in setup.A_rows[2]])
    vals = np.concatenate([t[2] for t in setup.A_rows[2]])
    A_dist = sp.coo_matrix(
        (vals, (rows, cols)),
        shape=(setup.ndofs[2], setup.ndofs[2])).tocsr()
    M = seqs[0].compute_mass_operator(FORM)
    W = seqs[0].compute_mass_operator(FORM + 1)
    A0 = (M + seqs[0].D[FORM].T @ W @ seqs[0].D[FORM]).tocsr()
    Pc = (sp.csr_matrix(seqs[0].P[FORM])
          @ sp.csr_matrix(seqs[1].P[FORM])).tocsr()
    Ac = (Pc.T @ A0 @ Pc).tocsr()
    perm = np.argsort(_serial_colmap(seqs, 2, FORM))
    Ac = Ac[perm][:, perm]
    d = (A_dist - Ac).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-9


def test_multilevel_distributed_unstructured_tets():
    """The recursion on an UNSTRUCTURED TET mesh (cube456, the reference
    testsuite's canonical mesh) with geometric agglomeration: per-level
    numbering and published P digit-exact vs serial."""
    from parelag_tpu.mesh.mesh import read_mesh
    from parelag_tpu.ops import csr as C
    from parelag_tpu.partitioning.partitioners import (
        geometric_box_partition)
    from parelag_tpu.parallel.dist_hierarchy import publish_P_level

    m = read_mesh("/root/reference/meshes/cube456.mesh")
    topo0 = AgglomeratedTopology.from_mesh(m)
    g = topo0.local_element_element()
    p1, n1 = C.connected_components(geometric_box_partition(m, 64), g)
    cent = np.zeros((n1, 3))
    ec = m.vertices[m.elements].mean(axis=1)
    np.add.at(cent, p1, ec)
    cent /= np.bincount(p1, minlength=n1)[:, None]
    p2_raw = ((cent[:, 0] > np.median(cent[:, 0])).astype(np.int64) * 2
              + (cent[:, 1] > np.median(cent[:, 1])).astype(np.int64))
    AE1g = C.transpose_orientation(p1, n1)
    g1 = sp.csr_matrix(C.bool_mult(
        C.pattern(AE1g @ topo0.B[0]), C.pattern(AE1g @ topo0.B[0]).T))
    p2, n2 = C.connected_components(p2_raw, g1)
    R = n2
    rank_of_elem = (np.arange(n2) % R)[p2[p1]]

    patches, gents = distributed_coarsen_multilevel(
        m, rank_of_elem, [p1, p2], R, upscaling_order=0)

    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(p1)
    topo.coarser.coarsen_local_partitioning(p2)
    seqs = [DeRhamSequenceFE(topo, m)]
    seqs[0].set_upscaling_targets(0)
    seqs.append(seqs[0].coarsen())
    seqs.append(seqs[1].coarsen())

    num1 = global_numbering_level(patches, gents, FORM, 1)
    num2 = global_numbering_level(patches, gents, FORM, 2)
    assert num1.ndofs == seqs[1].dof[FORM].ndofs
    assert num2.ndofs == seqs[2].dof[FORM].ndofs

    rows, cols, vals = publish_P_level(
        patches, gents, num1, num2, FORM, 1)
    P_dist = sp.coo_matrix((vals, (rows, cols)),
                           shape=(num1.ndofs, num2.ndofs)).tocsr()
    cmap_r = _serial_colmap(seqs, 1, FORM)
    cmap_c = _serial_colmap(seqs, 2, FORM)
    P_serial = sp.csr_matrix(seqs[1].P[FORM])[
        np.argsort(cmap_r)][:, np.argsort(cmap_c)]
    d = (P_dist - P_serial).tocoo()
    assert (np.abs(d.data).max() if d.nnz else 0.0) < 1e-11
