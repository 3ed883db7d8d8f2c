"""Maxwell (UpscalingMaxwell.cpp equivalent) tests: manufactured-solution
Hcurl upscaling with discontinuous conductivity; error decay across levels
and Hiptmair-AMGe solve."""

import numpy as np
import pytest

from parelag_tpu.models.maxwell import (
    upscaling_maxwell, E_exact, rhs_exact, sigma)


@pytest.fixture(scope="module")
def result():
    return upscaling_maxwell(nref_parallel=2)


def test_errors_decay_with_level(result):
    # coarser level (first entry) has larger error than middle level
    assert result.u_l2_errors[0] > result.u_l2_errors[1]
    assert result.u_energy_errors[0] > result.u_energy_errors[1]
    # middle-level error is a reasonable fraction of the solution norm
    assert result.u_l2_errors[1] < 0.2 * result.u_norms[0]


def test_sigma_contrast():
    rng = np.random.RandomState(0)
    p = rng.rand(1000, 3)
    s = sigma(p)
    assert s.min() > 1e-4 and s.max() < 1e4
    assert s.max() / s.min() > 1e2   # strong contrast


def test_amge_hiptmair_solver_path():
    r = upscaling_maxwell(nref_parallel=1, use_amge_solver=True)
    # the AMGe-Hiptmair-PCG fine solve must agree with the direct solve
    r_direct = upscaling_maxwell(nref_parallel=1)
    assert r.u_l2_errors[0] == pytest.approx(
        r_direct.u_l2_errors[0], rel=1e-4)
