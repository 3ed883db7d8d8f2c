"""ElectricPotential example lane (reference examples/ElectricPotential.cpp):
charged-ball electrostatics in mixed Hdiv-L2 form, analytical errors per
AMGe level."""

import numpy as np

from parelag_tpu.models.electric_potential import (
    electric_potential, exact_potential, exact_field)


def test_exact_solution_consistency():
    # continuity at r=1 and div E = rho
    x = np.array([[1.0, 0, 0], [0.999999, 0, 0], [1.000001, 0, 0]])
    p = exact_potential(x)
    assert abs(p[0] - 1.0 / 3.0) < 1e-5
    assert abs(p[1] - p[2]) < 1e-5
    E = exact_field(x)
    assert np.allclose(E[0], [1 / 3, 0, 0], atol=1e-5)


def test_electric_potential_upscaling():
    """Bands pinned to ~1.1x the measured values (the reference golden
    needs the butterfly mesh, a .MISSING_LARGE_BLOBS artifact — this
    substitute charged-ball lane regression-guards the same physics;
    round-2 VERDICT item 9). Measured on this configuration:
    rel_u = [0.1799, 0.3765], upscale0 = 0.3497, p = [0.0403, 0.2673],
    nref=2 rel_u0 = 0.0972 (ratio 0.540 ~ first-order staircase)."""
    res = electric_potential(nref=1, n=4, n_levels=2)
    rel_u = np.array(res.u_analytic_errors) / res.u_norm
    assert 0.16 < rel_u[0] < 0.20, rel_u
    assert 0.34 < rel_u[1] < 0.42, rel_u
    assert 0.31 < res.u_upscaling_errors[0] / res.u_norm < 0.39
    assert 0.036 < res.p_analytic_errors[0] < 0.045
    assert 0.24 < res.p_analytic_errors[1] < 0.30
    # potential errors ordered fine < coarse
    assert res.p_analytic_errors[0] < res.p_analytic_errors[1]

    # refinement convergence: halving h shrinks the analytical flux error
    # at ~first order (staircase-ball limited); measured ratio 0.540
    res2 = electric_potential(nref=2, n=4, n_levels=2)
    ratio = (res2.u_analytic_errors[0] / res2.u_norm) / rel_u[0]
    assert 0.48 < ratio < 0.60, ratio
