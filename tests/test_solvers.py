"""Device solver stack tests: ELL SpMV, PCG, smoothers, AMGe V-cycle.

Mirrors the reference solver regression strategy
(examples/CMakeLists.txt:146-187, MultigridTest*Form): assert convergence to
tolerance and healthy V-cycle convergence factors per form.
"""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from parelag_tpu.ops.device_sparse import from_scipy, ell_matvec_T
from parelag_tpu.solvers.cg import pcg, pcg_host
from parelag_tpu.models.multigrid import multigrid_test_form


def test_ell_matvec_matches_scipy():
    rng = np.random.RandomState(0)
    A = sp.random(50, 40, density=0.1, random_state=rng, format="csr")
    x = rng.rand(40)
    E = from_scipy(A)
    assert np.allclose(np.asarray(E @ jnp.asarray(x)), A @ x)
    y = rng.rand(50)
    assert np.allclose(np.asarray(ell_matvec_T(E, jnp.asarray(y))),
                       A.T @ y)


def test_pcg_solves_spd():
    rng = np.random.RandomState(1)
    n = 60
    Q = rng.rand(n, n)
    A = sp.csr_matrix(Q @ Q.T + n * np.eye(n))
    b = rng.rand(n)
    x, (it, nom) = pcg_host(A, b, rtol=1e-10, maxiter=500)
    assert np.linalg.norm(A @ x - b) < 1e-7 * np.linalg.norm(b)


@pytest.mark.parametrize("form,max_iters,max_conv", [
    (0, 8, 0.15),
    (1, 15, 0.40),
    (2, 15, 0.45),
])
def test_amge_vcycle_pcg(form, max_iters, max_conv):
    r = multigrid_test_form(form, nref=2)
    assert r.final_residual < 1e-4
    assert r.iterations <= max_iters
    assert r.conv_factor <= max_conv


def test_wcycle_converges():
    r = multigrid_test_form(0, nref=2, mu=2)
    assert r.iterations <= 6
