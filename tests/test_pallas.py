"""Pallas kernel tests (interpret mode on CPU; the real-TPU lowering is
probed at runtime and falls back to the XLA path when unsupported)."""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from parelag_tpu.ops.device_sparse import from_scipy
from parelag_tpu.ops.pallas_kernels import ell_spmv_pallas, ell_matvec_best


def test_pallas_spmv_interpret_matches_scipy():
    rng = np.random.RandomState(0)
    A = sp.random(512, 300, density=0.05, random_state=rng, format="csr")
    E = from_scipy(A, dtype=np.float64)
    x = rng.rand(300)
    y = ell_spmv_pallas(E.indices, E.values, jnp.asarray(x), interpret=True)
    assert np.allclose(np.asarray(y), A @ x)


def test_ell_matvec_best_fallback():
    rng = np.random.RandomState(1)
    A = sp.random(100, 100, density=0.1, random_state=rng,
                  format="csr") + sp.identity(100)
    E = from_scipy(A.tocsr(), dtype=np.float64)
    x = rng.rand(100)
    y = ell_matvec_best(E, jnp.asarray(x))
    assert np.allclose(np.asarray(y), A @ x)
