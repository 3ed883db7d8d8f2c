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
    res = electric_potential(nref=1, n=4, n_levels=2)
    rel_u = np.array(res.u_analytic_errors) / res.u_norm
    # fine level resolves the field up to the staircase-ball approximation
    # (h = 0.5 here)
    assert rel_u[0] < 0.25
    # the coarse solve cannot beat the fine one, and PV+target coarse
    # spaces keep it in the same ballpark
    assert rel_u[1] >= rel_u[0] * 0.99
    assert rel_u[1] < 0.5
    assert res.u_upscaling_errors[0] / res.u_norm < 0.4
    # potential errors ordered fine < coarse
    assert res.p_analytic_errors[0] < res.p_analytic_errors[1]

    # refinement convergence: halving h shrinks the analytical flux error
    res2 = electric_potential(nref=2, n=4, n_levels=2)
    assert res2.u_analytic_errors[0] / res2.u_norm < 0.75 * rel_u[0]
