"""Arbitrary-order TET de Rham sequences (the trimmed family
P_{p+1} -> ND_{p+1} -> RT_{p+1} -> P_p) on the reference's cube456 mesh —
the --feorder surface on the testsuite's own tet meshes
(DeRhamSequenceFE.cpp:83-310 order-generic tet collections)."""

import numpy as np
import pytest
import scipy.sparse as sp

from parelag_tpu.mesh.mesh import read_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.tetfe_ho import tet_ref
from parelag_tpu.amge.fespace3d_tet_ho import DeRhamSequenceTetFE_HO
from parelag_tpu.partitioning.partitioners import graph_partition

CUBE456 = "/root/reference/meshes/cube456.mesh"


@pytest.mark.parametrize("p", [0, 1, 2, 3])
def test_reference_element(p):
    # monomial-generated ND/RT spaces lose ~2 digits per order to
    # conditioning; still 1e-9-clean at p=3
    tol = 1e-11 if p <= 2 else 1e-9
    R = tet_ref(p)
    assert np.abs(R.nd_dofs(R.nd_eval(R.dof_pts))
                  - np.eye(R.nND)).max() < tol
    assert np.abs(R.rt_dofs(R.rt_eval(R.dof_pts))
                  - np.eye(R.nRT)).max() < tol
    assert np.abs(R.h1_eval(R.h1_nodes) - np.eye(R.nH1)).max() < tol
    assert np.abs(R.D1 @ R.D0).max() < tol
    assert np.abs(R.D2 @ R.D1).max() < tol


@pytest.fixture(scope="module", params=[1, 2])
def seq_p(request):
    p = request.param
    m = read_mesh(CUBE456)
    return p, DeRhamSequenceTetFE_HO(
        AgglomeratedTopology.from_mesh(m), m, p)


def test_chain_complex(seq_p):
    p, seq = seq_p
    assert np.abs((seq.D[1] @ seq.D[0])).max() < 1e-11
    assert np.abs((seq.D[2] @ seq.D[1])).max() < 1e-11


def test_commuting_interpolation_poly_exact(seq_p):
    p, seq = seq_p
    D0, D1, D2 = seq.D

    def u(q):
        return q[..., 0] * q[..., 1] + q[..., 2]

    def gu(q):
        out = np.zeros(q.shape)
        out[..., 0] = q[..., 1]
        out[..., 1] = q[..., 0]
        out[..., 2] = 1.0
        return out

    uh = seq.interpolate_scalar_targets(0, [u])[:, 0]
    guh = seq.interpolate_vector_targets(1, [gu])[:, 0]
    assert np.abs(D0 @ uh - guh).max() < 1e-11
    assert np.abs(D1 @ guh).max() < 1e-11

    def v(q):
        out = np.zeros(q.shape)
        out[..., 0] = q[..., 0]
        out[..., 1] = q[..., 1] * q[..., 0] if p >= 1 else 0 * q[..., 1]
        out[..., 2] = 1.0
        return out

    def dv(q):
        return 1.0 + (q[..., 0] if p >= 1 else 0 * q[..., 0])

    vh = seq.interpolate_vector_targets(2, [v])[:, 0]
    dvh = seq.interpolate_scalar_targets(3, [dv])[:, 0]
    assert np.abs(D2 @ vh - dvh).max() < 1e-11


def test_mass_integration_exactness(seq_p):
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
    r = seq.L2_const_rep
    assert abs(r @ (seq.compute_mass_operator(3) @ r) - vol) < 1e-10


@pytest.mark.parametrize("p", [1, 2])
def test_coarsen_invariants_unstructured(p):
    """The AMGe engine on HO tet spaces over a METIS-style agglomeration
    of cube456 (the reference's canonical unstructured configuration)."""
    m = read_mesh(CUBE456)
    topo = AgglomeratedTopology.from_mesh(m)
    part = graph_partition(topo.local_element_element(), 57, seed=0)
    topo.coarsen_local_partitioning(part)
    seq = DeRhamSequenceTetFE_HO(topo, m, p)
    seq.set_upscaling_targets(0)
    coarse = seq.coarsen()
    for j in range(4):
        P = sp.csr_matrix(seq.P[j])
        err = np.abs(
            (seq.Pi[j].matrix @ P) - sp.identity(P.shape[1])).max()
        assert err < 1e-10, f"form {j}: PiP != I ({err})"
    for j in range(3):
        comm = np.abs(sp.csr_matrix(coarse.D[j])
                      - seq.Pi[j + 1].matrix @ seq.D[j] @ seq.P[j]).max()
        assert comm < 1e-7, f"form {j}: Dc != Pi Df P ({comm})"
    assert np.abs(sp.csr_matrix(coarse.D[1])
                  @ sp.csr_matrix(coarse.D[0])).max() < 1e-10
    assert np.abs(sp.csr_matrix(coarse.D[2])
                  @ sp.csr_matrix(coarse.D[1])).max() < 1e-10


def test_ho_upscaling_driver_tet():
    """upscaling_general_form(feorder=1) on a tet mesh runs end to end
    through the generic driver (mesh kind dispatch)."""
    from parelag_tpu.models.upscaling import upscaling_general_form
    m = read_mesh(CUBE456)
    # driver builds its own hex mesh by default; drive the tet path via
    # build_hierarchy directly
    from parelag_tpu.models.upscaling import (
        build_hierarchy, mark_dofs_on_bndr, boundary_rhs,
        eliminate_rowcols)
    import scipy.sparse.linalg as spla
    mesh, topos, seqs = build_hierarchy(
        n_levels=2, mesh=m, unstructured=True, feorder=1)
    seq = seqs[0]
    M = seq.compute_mass_operator(0)
    W = seq.compute_mass_operator(1)
    A = (M + seq.D[0].T @ W @ seq.D[0]).tocsr()
    b = boundary_rhs(seq, 0, {1: -1.0})
    marker = mark_dofs_on_bndr(seq, 0, {2, 3, 4, 5})
    A, b = eliminate_rowcols(A, b, marker, np.zeros(A.shape[0]))
    x = spla.spsolve(A.tocsc(), b)
    assert np.isfinite(x).all()
    # coarse-level projection solves too (2-level upscaling step)
    P = seqs[0].P[0]
    Ac = (P.T @ A @ P).tocsr()
    bc = P.T @ b
    xc = spla.spsolve(Ac.tocsc(), bc)
    r = x - P @ xc
    rel = np.sqrt(r @ (M @ r)) / max(np.sqrt(x @ (M @ x)), 1e-30)
    assert rel < 0.3
