"""Elasticity upscaling tests (ElasticityUpscaling0Form equivalent)."""

import numpy as np
import pytest

from parelag_tpu.amge import hexfe
from parelag_tpu.models.elasticity import (
    assemble_elasticity, vector_interp, elasticity_upscaling)
from parelag_tpu.models.upscaling import build_hierarchy


def test_elasticity_element_matrix():
    coords = np.array([[[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]],
                      dtype=float)
    K = hexfe.hex_elasticity_stiffness(coords, 1.0, 1.0)[0]
    V = coords[0]
    # rigid modes have zero energy
    for u in (np.concatenate([np.ones(8), np.zeros(16)]),
              np.concatenate([-V[:, 1], V[:, 0], np.zeros(8)]),
              np.concatenate([np.zeros(8), -V[:, 2], V[:, 1]])):
        assert abs(u @ K @ u) < 1e-12
    # uniaxial strain energy = (lam + 2 mu) * vol
    u = np.concatenate([V[:, 0], np.zeros(16)])
    assert u @ K @ u == pytest.approx(3.0)
    assert np.abs(K - K.T).max() < 1e-12


def test_linear_displacements_reproduced():
    """The vector-H1 coarse space contains all linear displacement fields
    (the Kron of the scalar P reproduces {1,x,y,z} per component)."""
    mesh, topos, seqs = build_hierarchy(nref_parallel=1)
    s = seqs[0]
    P = vector_interp(s.P[0])
    Pi = vector_interp(s.Pi[0].matrix.tocsr())
    nv = mesh.num_vertices
    V = mesh.vertices
    rng = np.random.RandomState(0)
    G = rng.rand(3, 3)
    u = np.concatenate([V @ G[a] for a in range(3)])
    back = P @ (Pi @ u)
    assert np.abs(back - u).max() < 1e-9


def test_elasticity_upscaling_errors():
    r = elasticity_upscaling(nref_parallel=1)
    # relative coarse error is small (linear fields exactly captured)
    assert r.u_l2_errors[0] < 0.10 * r.u_norms[0]
    assert r.u_energy_errors[0] < 0.15
