"""Blocked saddle-point AMGe multigrid tests (MultigridTestDarcy analog:
GMRES preconditioned with the blocked V-cycle, reference
ParELAG_Hierarchy.cpp:397+ / darcy_example_parameters.xml composition)."""

import numpy as np
import scipy.sparse.linalg as spla
import jax.numpy as jnp
import pytest

from parelag_tpu.models.darcy import build_darcy_hierarchy
from parelag_tpu.solvers.block import (
    build_darcy_amge_hierarchy, darcy_gmres_solve, monolithic_saddle)
from parelag_tpu.solvers.cg import gmres
from parelag_tpu.amge import hexfe
from parelag_tpu.ops.device_sparse import from_scipy


def test_jitted_gmres_solves():
    rng = np.random.RandomState(0)
    n = 80
    Q = rng.rand(n, n)
    A = Q @ Q.T + n * np.eye(n)     # SPD
    import scipy.sparse as sp
    E = from_scipy(sp.csr_matrix(A))
    b = jnp.asarray(rng.rand(n))
    x, (it, res) = gmres(lambda v: E @ v, b, rtol=1e-10, restart=40)
    assert float(res) < 1e-8 * np.linalg.norm(np.asarray(b))


def test_darcy_blocked_mg_gmres():
    mesh, topos, seqs = build_darcy_hierarchy(
        nref_parallel=2, partition="derefine", aggressive_levels=0)
    H, A_levels, n0s = build_darcy_amge_hierarchy(seqs, sweeps=3, omega=0.6)
    vols = hexfe.hex_volumes(mesh.vertices[mesh.elements])
    b = np.concatenate([np.zeros(n0s[0]), vols])
    x, (it, res) = darcy_gmres_solve(H, A_levels[0], b, rtol=1e-8)
    xref = spla.spsolve(A_levels[0].tocsc(), b)
    assert np.abs(x - xref).max() < 1e-8
    assert it <= 2          # converges within two GMRES(50) cycles


def test_darcy_blocked_mg_with_w_weight():
    mesh, topos, seqs = build_darcy_hierarchy(
        nref_parallel=1, partition="derefine", aggressive_levels=0)
    H, A_levels, n0s = build_darcy_amge_hierarchy(
        seqs, w_weight=1.0, sweeps=3, omega=0.6)
    vols = hexfe.hex_volumes(mesh.vertices[mesh.elements])
    b = np.concatenate([np.zeros(n0s[0]), vols])
    x, (it, res) = darcy_gmres_solve(H, A_levels[0], b, rtol=1e-8)
    xref = spla.spsolve(A_levels[0].tocsc(), b)
    assert np.abs(x - xref).max() < 1e-7
