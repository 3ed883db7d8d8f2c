"""2D de Rham sequence tests (DeRhamSequence2D_Hdiv_FE equivalent):
H1 -> Hdiv -> L2 on quad meshes, chain identities, coarsening invariants,
and a 2D Poisson upscaling solve."""

import numpy as np
import pytest

from parelag_tpu.mesh.mesh import quad_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace2d import DeRhamSequence2DFE
from parelag_tpu.partitioning.partitioners import refined_mesh_partition
from parelag_tpu.ops import csr as C


@pytest.fixture(scope="module")
def seq2d():
    m = quad_grid_mesh(2, 2).uniform_refinement().uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(refined_mesh_partition(64, 16))
    s = DeRhamSequence2DFE(topo, m)
    s.set_upscaling_targets(0)
    return m, topo, s


def test_chain_and_masses(seq2d):
    m, topo, s = seq2d
    assert C.max_abs((s.D[1] @ s.D[0]).tocsr()) < 1e-14
    # constant-field energies = domain area (1.0)
    ones = np.ones(s.dof[0].ndofs)
    assert ones @ (s.compute_mass_operator(0) @ ones) == pytest.approx(1.0)
    M1 = s.compute_mass_operator(1)
    for comp in range(2):
        e = np.zeros(2)
        e[comp] = 1.0
        v = s.interpolate_vector_targets(
            1, [lambda p, e=e: np.broadcast_to(e, p.shape[:-1] + (2,))]
        )[:, 0]
        assert v @ (M1 @ v) == pytest.approx(1.0)


def test_rotgrad_commutes(seq2d):
    m, topo, s = seq2d

    def f(p):
        return p[..., 0] ** 2 - 3 * p[..., 1]

    def rotgrad(p):
        # rot(grad f) = R(-90) grad f = (df/dy, -df/dx)
        out = np.zeros(p.shape[:-1] + (2,))
        out[..., 0] = -3.0
        out[..., 1] = -2 * p[..., 0]
        return out

    u = s.interpolate_scalar_targets(0, [f])[:, 0]
    g = s.interpolate_vector_targets(1, [rotgrad])[:, 0]
    assert np.allclose(s.D[0] @ u, g, atol=1e-12)


def test_coarsen_invariants_2d(seq2d):
    m, topo, s = seq2d
    coarse = s.coarsen(svd_tol=1e-9)
    errs, bad = s.check_invariants(tol=1e-8)
    assert not bad, bad
    for j in range(3):
        t = s.targets[j]
        back = s.P[j] @ (s.Pi[j].matrix @ t)
        assert np.abs(back - t).max() < 1e-8


def test_2d_poisson_upscaling(seq2d):
    """f=1, u=0 on the whole boundary; coarse solution error decays."""
    m, topo, s = seq2d
    if s.coarser is None:
        s.coarsen(svd_tol=1e-9)
    from parelag_tpu.models.upscaling import (
        mark_dofs_on_bndr, eliminate_rowcols, solve_spd)
    A = (s.compute_mass_operator(0)
         + s.D[0].T @ s.compute_mass_operator(1) @ s.D[0]).tocsr()
    b = s.domain_lf_scalar(0, lambda p: np.ones(p.shape[:-1]))
    marker = mark_dofs_on_bndr(s, 0, {1, 2, 3, 4})
    A0, b0 = eliminate_rowcols(A, b.copy(), marker, np.zeros(A.shape[0]))
    x0 = solve_spd(A0, b0, "direct")

    cs = s.coarser
    Ac = (s.P[0].T @ A @ s.P[0]).tocsr()
    bc = s.P[0].T @ b
    mc = mark_dofs_on_bndr(cs, 0, {1, 2, 3, 4})
    Ac, bc = eliminate_rowcols(Ac, bc, mc, np.zeros(Ac.shape[0]))
    xc = solve_spd(Ac, bc, "direct")
    diff = s.P[0] @ xc - x0
    M = s.compute_mass_operator(0)
    rel = np.sqrt(diff @ (M @ diff)) / np.sqrt(x0 @ (M @ x0))
    assert rel < 0.1


def test_2d_shared_vertex_pinch():
    """2D analog of the sv2 pinch: two agglomerates touching at one vertex.
    The connectivity fixup splits diagonal pairs; a genuinely pinched
    interface vertex is promoted/repaired so the 2D de Rham coarsening
    (H1 -> Hdiv(rot) -> L2) keeps its invariants."""
    import numpy as np
    from parelag_tpu.mesh.mesh import quad_grid_mesh
    from parelag_tpu.topology.topology import AgglomeratedTopology
    from parelag_tpu.amge.fespace2d import DeRhamSequence2DFE

    m = quad_grid_mesh(2, 2)
    p = np.zeros(4, dtype=np.int64)
    p[0] = p[3] = 1                      # diagonal pair, vertex-connected
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(p.copy(), check_topology=True)
    seq = DeRhamSequence2DFE(topo, m)
    seq.set_upscaling_targets(0)
    seq.coarsen(svd_tol=1e-9)
    errs, bad = seq.check_invariants(tol=1e-8)
    assert not bad, (bad, errs)


def _adversarial_2d(nx, assign, force_repair_hook=False):
    from parelag_tpu.mesh.mesh import quad_grid_mesh
    from parelag_tpu.topology.topology import AgglomeratedTopology
    from parelag_tpu.amge.fespace2d import DeRhamSequence2DFE

    m = quad_grid_mesh(nx, nx)
    ctr = m.vertices[m.elements].mean(axis=1)
    ix = (ctr[:, 0] * nx).astype(int)
    iy = (ctr[:, 1] * nx).astype(int)
    cid = {(ix[e], iy[e]): e for e in range(m.num_elements)}
    part = np.zeros(m.num_elements, dtype=np.int64)
    for key, ae in assign.items():
        part[cid[key]] = ae
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(part, check_topology=True)
    if force_repair_hook:
        topo.had_pinch_repair = True
    seq = DeRhamSequence2DFE(topo, m)
    seq.set_upscaling_targets(0)
    seq.coarsen(svd_tol=1e-9)
    return topo, seq


@pytest.mark.parametrize("assign", [
    {(1, 1): 1, (2, 2): 2},                          # diagonal cells
    {(0, 0): 1, (1, 0): 1, (1, 1): 1,
     (2, 2): 2, (2, 3): 2, (3, 2): 2},               # two L's at a vertex
    {(0, 0): 1, (0, 1): 1, (1, 1): 1,
     (2, 2): 1, (3, 2): 1, (3, 3): 1},               # split bowtie
])
def test_2d_adversarial_partitions_never_pinch(assign):
    """In 2D the ELAG-19 pinch is unreachable: a vertex on the closure of
    two coarse facets gets the signature {A, B} and the minimal-
    intersection-set grouping promotes it to its own coarse ridge, so no
    entity is ever interiorly claimed by two coarse facets (in 3D the
    pinch lives at the edge/vertex codims BELOW the MIS'd facets). The
    adversarial partitions here coarsen with exact invariants and never
    fire the repair."""
    topo, seq = _adversarial_2d(4, assign)
    assert not getattr(topo, "had_pinch_repair", False)
    errs, bad = seq.check_invariants(tol=1e-8)
    assert not bad, (bad, errs)


def test_2d_curl_range_hook_runs():
    """The curl-range enrichment hook (sequence.coarsen, jform =
    nforms-3 = 0 in 2D) is wired for 2D sequences: with the pinch-repair
    flag forced on a clean topology the repair pass runs through the 2D
    Hdiv(rot) machinery, finds a zero commuting gap, adds no dofs, and
    the invariants stay exact (ROADMAP round-4 item: 2D lane for the
    _repair_curl_range hook)."""
    topo, seq = _adversarial_2d(
        4, {(0, 0): 1, (1, 0): 1, (1, 1): 1,
            (2, 2): 2, (2, 3): 2, (3, 2): 2}, force_repair_hook=True)
    cs = seq.coarser
    # zero commuting gap -> no enrichment dofs appended
    R = seq.D[0] @ seq.P[0] - seq.P[1] @ cs.D[0]
    assert abs(R).max() < 1e-10
    errs, bad = seq.check_invariants(tol=1e-8)
    assert not bad, (bad, errs)
