"""Arbitrary-order 2D de Rham sequence (feorder > 0, VERDICT r1 #5).

Acceptance mirrors the reference's order handling (-feo in every example,
DeRhamSequenceFE order machinery): exact chain identities at every order,
commuting interpolation, interpolation convergence at the right rate, and
the full AMGe Coarsen with exact invariants on top of the higher-order
fine space (the coarsening machinery is order-agnostic; these lanes prove
it on spaces with several dofs per mesh entity)."""

import numpy as np
import pytest

from parelag_tpu.mesh.mesh import quad_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace2d_ho import DeRhamSequence2DFE_HO
from parelag_tpu.partitioning.partitioners import refined_mesh_partition
from parelag_tpu.ops import csr as C


def _build(p, nref=2, coarsen=False):
    m = quad_grid_mesh(2, 2)
    for _ in range(nref):
        m = m.uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    if coarsen:
        ne = m.num_elements
        topo.coarsen_local_partitioning(refined_mesh_partition(ne, ne // 4))
    s = DeRhamSequence2DFE_HO(topo, m, feorder=p)
    return m, topo, s


@pytest.mark.parametrize("p", [0, 1, 2])
def test_chain_exact(p):
    m, topo, s = _build(p, nref=1)
    assert C.max_abs((s.D[1] @ s.D[0]).tocsr()) < 1e-10
    # constant-field energies = domain area (1.0)
    ones = np.ones(s.dof[0].ndofs)
    M0 = s.compute_mass_operator(0)
    assert ones @ (M0 @ ones) == pytest.approx(1.0)
    for comp in range(2):
        e = np.zeros(2)
        e[comp] = 1.0
        v = s.interpolate_vector_targets(
            1, [lambda q, e=e: np.broadcast_to(e, q.shape[:-1] + (2,))]
        )[:, 0]
        M1 = s.compute_mass_operator(1)
        assert v @ (M1 @ v) == pytest.approx(1.0)
    one2 = s.interpolate_scalar_targets(
        2, [lambda q: np.ones(q.shape[:-1])])[:, 0]
    M2 = s.compute_mass_operator(2)
    assert one2 @ (M2 @ one2) == pytest.approx(1.0)


@pytest.mark.parametrize("p", [1, 2])
def test_commuting_interpolation(p):
    """rot-grad of the H1 interpolant == RT interpolant of rot-grad for a
    polynomial of degree p+1 (exact at that order), and div/L2 likewise."""
    m, topo, s = _build(p, nref=1)

    def f(q):
        return q[..., 0] ** (p + 1) + 2 * q[..., 0] * q[..., 1] ** p

    def rotgrad(q):
        out = np.zeros(q.shape[:-1] + (2,))
        dx = (p + 1) * q[..., 0] ** p + 2 * q[..., 1] ** p
        dy = 2 * p * q[..., 0] * q[..., 1] ** (p - 1) if p else \
            np.zeros(q.shape[:-1])
        out[..., 0] = dy
        out[..., 1] = -dx
        return out

    u = s.interpolate_scalar_targets(0, [f])[:, 0]
    g = s.interpolate_vector_targets(1, [rotgrad])[:, 0]
    scale = max(np.abs(g).max(), 1.0)
    assert np.abs(s.D[0] @ u - g).max() < 1e-10 * scale

    def v(q):
        out = np.zeros(q.shape[:-1] + (2,))
        out[..., 0] = q[..., 0] ** (p + 1)
        out[..., 1] = q[..., 1] * q[..., 0] ** p
        return out

    def divv(q):
        return ((p + 1) * q[..., 0] ** p + q[..., 0] ** p)

    vd = s.interpolate_vector_targets(1, [v])[:, 0]
    dv = s.interpolate_scalar_targets(2, [divv])[:, 0]
    scale = max(np.abs(dv).max(), 1.0)
    assert np.abs(s.D[1] @ vd - dv).max() < 1e-9 * scale


@pytest.mark.parametrize("p", [0, 1, 2])
def test_h1_interpolation_convergence(p):
    """L2 interpolation error decays at order p+2 for H1 = Q_{p+1}."""
    def f(q):
        return np.sin(np.pi * q[..., 0]) * np.cos(np.pi * q[..., 1])

    errs = []
    for nref in (1, 2):
        m, topo, s = _build(p, nref=nref)
        u = s.interpolate_scalar_targets(0, [f])[:, 0]
        M0 = s.compute_mass_operator(0)
        # L2 error via quadrature against the interpolant
        R = s.ref
        vals = np.einsum("iq,ni->nq", R.h1_V,
                         u[s.dof[0].entity_dofs(0)])
        exact = f(s.qphys)
        err2 = np.sum(R.qw[None, :] * np.abs(s.detJ)
                      * (vals - exact) ** 2)
        errs.append(np.sqrt(err2))
    rate = np.log2(errs[0] / errs[1])
    assert rate > (p + 2) - 0.4, (errs, rate)


@pytest.mark.parametrize("p", [1, 2])
def test_coarsen_invariants_ho(p):
    """Full AMGe Coarsen on the order-p fine sequence: all de Rham
    invariants exact (this exercises multi-dof entities through the whole
    trace/extension machinery)."""
    m, topo, s = _build(p, nref=2, coarsen=True)
    s.set_upscaling_targets(0)
    s.coarsen(svd_tol=1e-9)
    errs, bad = s.check_invariants(tol=1e-8)
    assert not bad, (p, bad, errs)


def test_p0_matches_lowest_order_counts():
    """feorder=0 reproduces the lowest-order space dimensions."""
    from parelag_tpu.amge.fespace2d import DeRhamSequence2DFE
    m, topo, s = _build(0, nref=1)
    s0 = DeRhamSequence2DFE(topo, m)
    for j in range(3):
        assert s.dof[j].ndofs == s0.dof[j].ndofs
