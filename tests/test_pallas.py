"""Pallas kernel tests (interpret mode on CPU; the real-TPU lowering is
probed at runtime and falls back to the XLA path when unsupported)."""

import os
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


def test_bcsr_pallas_on_device():
    """The BCSR pallas kernel lowers + computes correctly on the real
    accelerator (subprocess; skipped without one). On the axon v5e it is
    measured SLOWER than the XLA einsum path (serial in-kernel gather) —
    correctness is what this lane pins down; the production path is XLA."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tpu_device import _have_tpu, _run
    if not _have_tpu():
        import pytest
        pytest.skip("no accelerator backend")
    r = _run("""
import numpy as np, jax.numpy as jnp
from parelag_tpu.ops.pallas_kernels import bcsr_spmv_pallas
rng = np.random.RandomState(0)
cb = jnp.asarray(rng.randint(0, 4, size=(16, 3)), jnp.int32)
tiles = jnp.asarray(rng.randn(16, 3, 8, 128), jnp.float32)
x = jnp.asarray(rng.randn(4 * 128), jnp.float32)
y = np.asarray(bcsr_spmv_pallas(cb, tiles, x))
xr = np.asarray(x).reshape(4, 128)
ref = np.einsum("nkrc,nkc->nr", np.asarray(tiles),
                xr[np.asarray(cb)]).reshape(-1)
assert np.abs(y - ref).max() < 1e-3 * np.abs(ref).max()
print("bcsr pallas ok")
""", timeout=1200)
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    assert "bcsr pallas ok" in r.stdout
