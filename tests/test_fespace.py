"""Fine-level FE space tests: exact local matrices, commuting derivative
identities, target/PV interpolation."""

import numpy as np
import pytest

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.amge import hexfe


@pytest.fixture(scope="module")
def seq223():
    m = hex_grid_mesh(2, 2, 3, 1.0, 1.0, 1.5)
    topo = AgglomeratedTopology.from_mesh(m)
    return DeRhamSequenceFE(topo, m)


def test_h1_mass_exact_unit_cube():
    m = hex_grid_mesh(1, 1, 1)
    coords = m.vertices[m.elements]
    M = hexfe.hex_h1_mass(coords)[0]
    # int over cube of N_i N_j: diagonal = (1/3)^3 = 1/27,
    # adjacent via edge: 1/27 * (1/2)... exact trilinear values:
    # same corner 1/27; differ in 1 coord: 1/54; 2 coords: 1/108; 3: 1/216
    def dist(i, j):
        a = hexfe.HEX_CORNERS[i] - hexfe.HEX_CORNERS[j]
        return int(np.abs(a).sum())
    expect = {0: 1 / 27, 1: 1 / 54, 2: 1 / 108, 3: 1 / 216}
    for i in range(8):
        for j in range(8):
            assert M[i, j] == pytest.approx(expect[dist(i, j)], rel=1e-12)
    assert M.sum() == pytest.approx(1.0, rel=1e-12)


def test_l2_rt_nd_masses_unit_cube():
    m = hex_grid_mesh(1, 1, 1)
    coords = m.vertices[m.elements]
    assert hexfe.hex_l2_mass(coords)[0, 0, 0] == pytest.approx(1.0)
    sgn = np.ones((1, 6))
    Mrt = hexfe.hex_rt_mass(coords, sgn)[0]
    # RT0 shapes: e.g. (x,0,0) and (x-1,0,0): int x^2 = 1/3, int x(x-1) = -1/6
    # diag: 1/3, opposite-face pair: -1/6 (sign dep), different dirs: 0
    assert Mrt[2, 2] == pytest.approx(1 / 3)
    assert abs(Mrt[2, 4]) == pytest.approx(1 / 6)
    assert Mrt[0, 1] == pytest.approx(0.0, abs=1e-14)
    sgn = np.ones((1, 12))
    Mnd = hexfe.hex_nd_mass(coords, sgn)[0]
    # ND0 diag: int (1-y)^2(1-z)^2 = 1/9
    assert Mnd[0, 0] == pytest.approx(1 / 9)
    # rowsums: mass of constant field e_x via 4 x-edges = 1
    ex_edges = [0, 2, 4, 6]
    s = sum(Mnd[i, j] for i in ex_edges for j in ex_edges)
    assert s == pytest.approx(1.0)


def test_mass_sums_constant_fields(seq223):
    """Constant-field energies over the whole mesh: interpolate constants
    and check v^T M v = integral over domain (volume = 1.5)."""
    s = seq223
    vol = 1.5
    M0 = s.compute_mass_operator(0)
    ones = np.ones(s.dof[0].ndofs)
    assert ones @ (M0 @ ones) == pytest.approx(vol, rel=1e-12)
    for jform in (1, 2):
        M = s.compute_mass_operator(jform)
        for comp in range(3):
            e = np.zeros(3)
            e[comp] = 1.0
            v = s.interpolate_vector_targets(
                jform, [lambda p, e=e: np.broadcast_to(e, p.shape)])[:, 0]
            assert v @ (M @ v) == pytest.approx(vol, rel=1e-12), \
                (jform, comp)
    M3 = s.compute_mass_operator(3)
    ones = np.ones(s.dof[3].ndofs)
    assert ones @ (M3 @ ones) == pytest.approx(vol, rel=1e-12)


def test_derivative_chain(seq223):
    s = seq223
    from parelag_tpu.ops import csr as C
    assert C.max_abs((s.D[1] @ s.D[0]).tocsr()) == 0.0
    assert C.max_abs((s.D[2] @ s.D[1]).tocsr()) < 1e-14


def test_gradient_commutes(seq223):
    s = seq223

    def f(p):
        return p[..., 0] ** 2 * p[..., 1] + 3 * p[..., 2]

    def gradf(p):
        out = np.zeros(p.shape)
        out[..., 0] = 2 * p[..., 0] * p[..., 1]
        out[..., 1] = p[..., 0] ** 2
        out[..., 2] = 3.0
        return out

    u = s.interpolate_scalar_targets(0, [f])[:, 0]
    gI = s.interpolate_vector_targets(1, [gradf])[:, 0]
    assert np.allclose(s.D[0] @ u, gI, atol=1e-12)


def test_curl_commutes(seq223):
    s = seq223

    def v(p):
        out = np.zeros(p.shape)
        out[..., 0] = p[..., 1] * p[..., 2]
        out[..., 1] = p[..., 0] ** 2
        out[..., 2] = p[..., 1]
        return out

    def curlv(p):
        out = np.zeros(p.shape)
        out[..., 0] = 1.0
        out[..., 1] = p[..., 1]
        out[..., 2] = 2 * p[..., 0] - p[..., 2]
        return out

    vI = s.interpolate_vector_targets(1, [v])[:, 0]
    cI = s.interpolate_vector_targets(2, [curlv])[:, 0]
    assert np.allclose(s.D[1] @ vI, cI, atol=1e-12)


def test_div_commutes(seq223):
    s = seq223

    def v(p):
        out = np.zeros(p.shape)
        out[..., 0] = 2 * p[..., 0]
        out[..., 1] = -p[..., 1]
        out[..., 2] = 0.5 * p[..., 2]
        return out

    # div v = 1.5 constant
    vI = s.interpolate_vector_targets(2, [v])[:, 0]
    divI = s.interpolate_scalar_targets(3, [lambda p: np.full(
        p.shape[:-1], 1.5)])[:, 0]
    assert np.allclose(s.D[2] @ vI, divI, atol=1e-12)


def test_upscaling_targets_shapes(seq223):
    s = seq223
    s.set_upscaling_targets(0)
    assert s.targets[0].shape[1] == 4   # 1, x, y, z
    assert s.targets[1].shape[1] == 3   # e_x, e_y, e_z
    assert s.targets[2].shape[1] == 3
    assert s.targets[3].shape[1] == 1
