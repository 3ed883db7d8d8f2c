"""Tetrahedral FE space tests: exact local matrices, commuting derivative
identities, and full de Rham coarsening invariants on the reference's
bundled cube456.mesh (NETGEN tet mesh of the unit cube)."""

import numpy as np
import pytest

from parelag_tpu.mesh.mesh import read_mesh, Mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.amge import tetfe
from parelag_tpu.partitioning.partitioners import graph_partition


@pytest.fixture(scope="module")
def cube456():
    m = read_mesh("/root/reference/meshes/cube456.mesh")
    topo = AgglomeratedTopology.from_mesh(m)
    return m, topo, DeRhamSequenceFE(topo, m)


def test_reference_tet_masses():
    # unit reference tet (vol 1/6)
    coords = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]]])
    vol = tetfe.tet_volumes(coords)[0]
    assert vol == pytest.approx(1 / 6)
    M = tetfe.tet_h1_mass(coords)[0]
    assert M[0, 0] == pytest.approx(vol / 10)
    assert M[0, 1] == pytest.approx(vol / 20)
    assert M.sum() == pytest.approx(vol)
    assert tetfe.tet_l2_mass(coords)[0, 0, 0] == pytest.approx(vol)
    # RT0: constant field e_x = sum_f (e_x . n_f A_f) phi_f; energy = vol
    sgn = np.ones((1, 4))
    Mrt = tetfe.tet_rt_mass(coords, sgn)[0]
    # fluxes of e_x through the 4 outward faces
    flux = []
    from parelag_tpu.mesh.mesh import TET_FACES
    for f in TET_FACES:
        a, b, c = coords[0][list(f)]
        n = 0.5 * np.cross(b - a, c - a)
        flux.append(n[0])
    flux = np.array(flux)
    assert flux @ Mrt @ flux == pytest.approx(vol, rel=1e-12)
    # ND0: constant field e_x via circulations
    from parelag_tpu.mesh.mesh import TET_EDGES
    Mnd = tetfe.tet_nd_mass(coords, np.ones((1, 6)))[0]
    circ = np.array([ (coords[0][b] - coords[0][a])[0]
                      for a, b in TET_EDGES])
    assert circ @ Mnd @ circ == pytest.approx(vol, rel=1e-12)


def test_cube456_constant_field_energies(cube456):
    m, topo, s = cube456
    vol = 1.0
    ones = np.ones(s.dof[0].ndofs)
    M0 = s.compute_mass_operator(0)
    assert ones @ (M0 @ ones) == pytest.approx(vol, rel=1e-10)
    for jform in (1, 2):
        M = s.compute_mass_operator(jform)
        for comp in range(3):
            e = np.zeros(3)
            e[comp] = 1.0
            v = s.interpolate_vector_targets(
                jform, [lambda p, e=e: np.broadcast_to(e, p.shape)])[:, 0]
            assert v @ (M @ v) == pytest.approx(vol, rel=1e-10)


def test_cube456_derivative_chain(cube456):
    m, topo, s = cube456
    from parelag_tpu.ops import csr as C
    assert C.max_abs((s.D[1] @ s.D[0]).tocsr()) == 0.0
    assert C.max_abs((s.D[2] @ s.D[1]).tocsr()) < 1e-12

    def f(p):
        return 2 * p[..., 0] - p[..., 1] * p[..., 2]

    def gradf(p):
        out = np.zeros(p.shape)
        out[..., 0] = 2.0
        out[..., 1] = -p[..., 2]
        out[..., 2] = -p[..., 1]
        return out

    u = s.interpolate_scalar_targets(0, [f])[:, 0]
    g = s.interpolate_vector_targets(1, [gradf])[:, 0]
    assert np.allclose(s.D[0] @ u, g, atol=1e-12)


def test_cube456_coarsen_invariants(cube456):
    m, topo, s = cube456
    part = graph_partition(topo.local_element_element(), 24, seed=0)
    topo.coarsen_local_partitioning(part, check_topology=True)
    s.set_upscaling_targets(0)
    coarse = s.coarsen(svd_tol=1e-9)
    errs, bad = s.check_invariants(tol=1e-8)
    assert not bad, bad
    # targets reproduced
    for j in range(4):
        t = s.targets[j]
        back = s.P[j] @ (s.Pi[j].matrix @ t)
        assert np.abs(back - t).max() < 1e-8
