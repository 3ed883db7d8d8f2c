"""Arbitrary-order 3D de Rham sequences (Q_{p+1} -> ND_p -> RT_p -> Q_p).

Acceptance per VERDICT r2 mandate #2 (reference order-generic assembly,
DeRhamSequenceFE.cpp:83-310): D.D = 0 exact, coarsen invariants (PiP = I,
commuting D) exact at p = 1, 2 in 3D, and interpolation convergence at the
expected order h^{p+1}.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.hexfe_ho import ref3
from parelag_tpu.amge.fespace3d_ho import DeRhamSequence3DFE_HO
from parelag_tpu.partitioning.partitioners import cartesian_partition


def _perturbed_mesh(n=3, amp=0.04, seed=0):
    m = hex_grid_mesh(n, n, n)
    rng = np.random.RandomState(seed)
    interior = np.all((m.vertices > 1e-9) & (m.vertices < 1 - 1e-9),
                      axis=1)
    m.vertices[interior] += amp * rng.randn(int(interior.sum()), 3) / n
    return m


@pytest.mark.parametrize("p", [0, 1, 2, 3])
def test_reference_element(p):
    R = ref3(p)
    assert np.abs(R.nd_dofs(R.nd_eval(R.dof_pts))
                  - np.eye(R.nND)).max() < 1e-12
    assert np.abs(R.rt_dofs(R.rt_eval(R.dof_pts))
                  - np.eye(R.nRT)).max() < 1e-12
    assert np.abs(R.D1 @ R.D0).max() < 1e-12
    assert np.abs(R.D2 @ R.D1).max() < 1e-12
    assert np.abs(R.h1_eval(R.h1_node_coords)
                  - np.eye(R.nH1)).max() < 1e-12


@pytest.fixture(scope="module", params=[1, 2])
def seq_p(request):
    p = request.param
    m = _perturbed_mesh()
    return p, DeRhamSequence3DFE_HO(
        AgglomeratedTopology.from_mesh(m), m, p)


def test_chain_complex(seq_p):
    p, seq = seq_p
    assert np.abs((seq.D[1] @ seq.D[0])).max() < 1e-12
    assert np.abs((seq.D[2] @ seq.D[1])).max() < 1e-12


def test_commuting_interpolation_poly_exact(seq_p):
    """grad/curl/div commute with interpolation on polynomial fields (the
    discrete de Rham diagram)."""
    p, seq = seq_p
    D0, D1, D2 = seq.D

    def u(q):
        return q[..., 0] ** p * q[..., 1] + q[..., 2]

    def gu(q):
        out = np.zeros(q.shape)
        out[..., 0] = p * q[..., 0] ** max(p - 1, 0) * q[..., 1]
        out[..., 1] = q[..., 0] ** p
        out[..., 2] = 1.0
        return out

    uh = seq.interpolate_scalar_targets(0, [u])[:, 0]
    guh = seq.interpolate_vector_targets(1, [gu])[:, 0]
    assert np.abs(D0 @ uh - guh).max() < 1e-11
    assert np.abs(D1 @ guh).max() < 1e-11          # curl grad = 0

    def v(q):
        out = np.zeros(q.shape)
        out[..., 0] = q[..., 0] ** p
        out[..., 1] = q[..., 1] * q[..., 0]
        out[..., 2] = q[..., 2]
        return out

    def dv(q):
        return p * q[..., 0] ** max(p - 1, 0) + q[..., 0] + 1.0

    vh = seq.interpolate_vector_targets(2, [v])[:, 0]
    dvh = seq.interpolate_scalar_targets(3, [dv])[:, 0]
    assert np.abs(D2 @ vh - dvh).max() < 1e-11


def test_mass_integration_exactness(seq_p):
    """Constant-field energies equal the mesh volume through every space's
    mass matrix (pullback + orientation folding correctness)."""
    p, seq = seq_p
    vol = seq.element_volumes().sum()

    one = seq.interpolate_scalar_targets(
        0, [lambda q: np.ones(q.shape[:-1])])[:, 0]
    assert abs(one @ (seq.compute_mass_operator(0) @ one) - vol) < 1e-10

    def ex(q):
        out = np.zeros(q.shape)
        out[..., 0] = 1.0
        return out

    e1 = seq.interpolate_vector_targets(1, [ex])[:, 0]
    assert abs(e1 @ (seq.compute_mass_operator(1) @ e1) - vol) < 1e-10
    e2 = seq.interpolate_vector_targets(2, [ex])[:, 0]
    assert abs(e2 @ (seq.compute_mass_operator(2) @ e2) - vol) < 1e-10
    if p >= 2:   # Q_p density resolves the trilinear detJ exactly
        r = seq.L2_const_rep
        assert abs(r @ (seq.compute_mass_operator(3) @ r) - vol) < 1e-10


@pytest.mark.parametrize("p", [1, 2])
def test_coarsen_invariants(p):
    """The AMGe engine on the HO fine space: PiP = I, Dc = Pi Df P,
    Dc Dc = 0 — the reference's CheckInvariants set
    (DeRhamSequence.hpp:480-524) at feorder > 0."""
    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(
        cartesian_partition((4, 4, 4), (2, 2, 2)))
    seq = DeRhamSequence3DFE_HO(topo, m, p)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen()
    for j in range(4):
        P = sp.csr_matrix(seq.P[j])
        err = np.abs(
            (seq.Pi[j].matrix @ P) - sp.identity(P.shape[1])).max()
        assert err < 1e-10, f"form {j}: PiP != I ({err})"
    for j in range(3):
        Dc = sp.csr_matrix(coarse.D[j])
        comm = np.abs(
            Dc - seq.Pi[j + 1].matrix @ seq.D[j] @ seq.P[j]).max()
        assert comm < 1e-10, f"form {j}: Dc != Pi Df P ({comm})"
    assert np.abs(sp.csr_matrix(coarse.D[1])
                  @ sp.csr_matrix(coarse.D[0])).max() < 1e-10
    assert np.abs(sp.csr_matrix(coarse.D[2])
                  @ sp.csr_matrix(coarse.D[1])).max() < 1e-10


@pytest.mark.parametrize("p", [1, 2])
def test_interpolation_convergence_order(p):
    """H1 interpolation error decays ~ h^{p+1} (the expected order)."""
    def u(q):
        return np.sin(2.1 * q[..., 0]) * np.cos(1.3 * q[..., 1]) \
            + q[..., 2] ** 2 * q[..., 0]

    errs = []
    for n in (2, 4):
        m = hex_grid_mesh(n, n, n)
        seq = DeRhamSequence3DFE_HO(
            AgglomeratedTopology.from_mesh(m), m, p)
        R = seq.R
        uh = seq.interpolate_scalar_targets(0, [u])[:, 0]
        # evaluate u_h at the volume quadrature points per element
        pi, sg = seq.S_h1
        g = uh[seq.dof[0].entity_dofs(0)]            # (ne, nH1) global
        # local reference dofs l = S^T g: l_{pi_i} with sign undone
        l = np.zeros_like(g)
        np.put_along_axis(l, pi, g * sg, axis=1)
        N = R.h1_eval(R.q3)                          # (nH1, nq)
        uh_q = l @ N
        du = uh_q - u(seq.qphys)
        errs.append(np.sqrt(np.sum(R.w3[None, :] * seq.detJ * du ** 2)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > p + 0.7, f"p={p}: rate {rate} (errs {errs})"


def test_ho_upscaling_driver():
    """--feorder surface: upscaling_general_form(feorder=p) runs end to
    end; feorder=0 stays on the golden path."""
    from parelag_tpu.models.upscaling import upscaling_general_form
    r0 = upscaling_general_form(0, nref_parallel=1, feorder=0)
    assert abs(r0.u_l2_errors[0] - 1.8389e-02) < 1e-6
    r1 = upscaling_general_form(0, nref_parallel=1, feorder=1)
    assert r1.ndofs[0] == 729
    assert r1.u_l2_errors[0] < 0.05


@pytest.mark.parametrize("p", [1, 2])
def test_poisson_solve_converges(p):
    """H1 Poisson at order p: the full operator A = M + D^T W D solves and
    the discrete solution converges to the smooth exact solution at
    ~ h^{p+1} in L2 (method-of-manufactured-solutions)."""
    import scipy.sparse.linalg as spla
    from parelag_tpu.models.upscaling import (
        mark_dofs_on_bndr, eliminate_rowcols)

    def uex(q):
        return np.sin(np.pi * q[..., 0]) * np.sin(np.pi * q[..., 1]) \
            * np.sin(np.pi * q[..., 2])

    def f(q):
        return (1.0 + 3 * np.pi ** 2) * uex(q)

    errs = []
    for n in (2, 4):
        m = hex_grid_mesh(n, n, n)
        seq = DeRhamSequence3DFE_HO(
            AgglomeratedTopology.from_mesh(m), m, p)
        M = seq.compute_mass_operator(0)
        W = seq.compute_mass_operator(1)
        A = (M + seq.D[0].T @ W @ seq.D[0]).tocsr()
        b = seq.domain_lf_scalar(0, f)
        marker = mark_dofs_on_bndr(seq, 0, {1, 2, 3, 4, 5, 6})
        A2, b2 = eliminate_rowcols(A, b, marker, np.zeros(A.shape[0]))
        x = spla.spsolve(A2.tocsc(), b2)
        d = x - seq.interpolate_scalar_targets(0, [uex])[:, 0]
        errs.append(float(np.sqrt(d @ (M @ d))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > p + 0.6, f"p={p}: L2 rate {rate} (errs {errs})"


def test_ho_spectral_hdiv_l2_targets():
    """Feature intersection: mixed Hdiv-L2 SPECTRAL coarse targets
    (LocalSpectralTargets.cpp:93-297) on an arbitrary-order fine space
    with a high-contrast coefficient — the engine is order-agnostic."""
    from parelag_tpu.amge.spectral import (
        compute_local_hdiv_l2_spectral_targets)

    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(
        cartesian_partition((4, 4, 4), (2, 2, 2)))
    seq = DeRhamSequence3DFE_HO(topo, m, 1)

    def perm(q):
        return np.where((np.floor(q[..., 0] * 4)
                         + np.floor(q[..., 1] * 4)) % 2 == 0, 1e3, 1.0)

    seq.replace_mass_integrator(2, perm)
    seq.jform_start = 2
    seq.set_upscaling_targets(0)
    seq.agglomerate_dofs()
    tr, l2 = compute_local_hdiv_l2_spectral_targets(seq, 0.0025, 8)
    seq.set_local_targets(1, 2, tr)
    seq.set_local_targets(0, 3, l2)
    coarse = seq.coarsen()
    for j in (2, 3):
        P = sp.csr_matrix(seq.P[j])
        err = np.abs(
            (seq.Pi[j].matrix @ P) - sp.identity(P.shape[1])).max()
        assert err < 1e-10, (j, err)
    comm = np.abs(sp.csr_matrix(coarse.D[2])
                  - seq.Pi[3].matrix @ seq.D[2] @ seq.P[2]).max()
    assert comm < 1e-10
    # spectral enrichment actually enriched: more coarse Hdiv dofs than
    # the PV-only count (one per coarse facet + derivative bubbles)
    n_facets = topo.coarser.num_entities(1)
    assert seq.P[2].shape[1] > n_facets
