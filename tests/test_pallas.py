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


def test_dia_jacobi_sweep_interpret_matches_reference():
    """Fused DIA Jacobi sweep (one dispatch per sweep — the V-cycle's
    dispatch-count lever) == the unfused x + d*(b - A@x)."""
    from parelag_tpu.ops.device_sparse import to_dia
    from parelag_tpu.ops.pallas_kernels import (
        dia_jacobi_sweep_pallas, dia_xpad_len)
    n = 9000
    A = sp.diags([6.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1),
                  -0.5 * np.ones(n - 30), -0.5 * np.ones(n - 30)],
                 [0, 1, -1, 30, -30]).tocsr().astype(np.float32)
    Ad = to_dia(A, dtype=np.float32)
    lo, hi = Ad.span
    npad = Ad.data.shape[1]
    rng = np.random.RandomState(0)
    b = rng.randn(n).astype(np.float32)
    x0 = rng.randn(n).astype(np.float32)
    dinv = (1.0 / np.asarray(np.abs(A).sum(axis=1)).ravel()
            ).astype(np.float32)
    bpad = jnp.zeros(npad, jnp.float32).at[:n].set(b)
    dpad = jnp.zeros(npad, jnp.float32).at[:n].set(dinv)
    xlen = dia_xpad_len(npad, lo, Ad.offs, Ad._TILE)
    xpad = jnp.zeros(xlen, jnp.float32).at[lo:lo + n].set(x0)
    xn = np.asarray(dia_jacobi_sweep_pallas(
        Ad.data, Ad.offs, xpad, bpad, dpad, lo, n, interpret=True))[:n]
    ref = x0 + dinv * (b - A @ x0)
    assert np.abs(xn - ref).max() < 1e-5 * np.abs(ref).max()


def test_dia_multirhs_spmv_interpret_matches_scipy():
    """Multi-RHS DIA SpMV (transposed layout, table read once for all
    right-hand sides) == scipy on every column."""
    from parelag_tpu.ops.device_sparse import to_dia
    from parelag_tpu.ops.pallas_kernels import (
        dia_spmv_multirhs_pallas, dia_xpad_len)
    n, s = 9000, 3
    A = sp.diags([6.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1),
                  -0.5 * np.ones(n - 30), -0.5 * np.ones(n - 30)],
                 [0, 1, -1, 30, -30]).tocsr().astype(np.float32)
    Ad = to_dia(A, dtype=np.float32)
    lo, _ = Ad.span
    npad = Ad.data.shape[1]
    rng = np.random.RandomState(0)
    X = rng.randn(n, s).astype(np.float32)
    xlen = dia_xpad_len(npad, lo, Ad.offs, Ad._TILE)
    xpadT = jnp.zeros((s, xlen), jnp.float32).at[:, lo:lo + n].set(X.T)
    y = np.asarray(dia_spmv_multirhs_pallas(
        Ad.data, Ad.offs, xpadT, lo, n, interpret=True))[:, :n].T
    ref = A @ X
    assert np.abs(y - ref).max() < 1e-5 * np.abs(ref).max()


def test_dia_multirhs_jacobi_sweep_interpret_matches_reference():
    """Fused multi-RHS DIA Jacobi sweep == the unfused update on every
    column (dpad shared across RHS)."""
    from parelag_tpu.ops.device_sparse import to_dia
    from parelag_tpu.ops.pallas_kernels import (
        dia_jacobi_sweep_multirhs_pallas, dia_xpad_len)
    n, s = 9000, 2
    A = sp.diags([6.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1),
                  -0.5 * np.ones(n - 30), -0.5 * np.ones(n - 30)],
                 [0, 1, -1, 30, -30]).tocsr().astype(np.float32)
    Ad = to_dia(A, dtype=np.float32)
    lo, _ = Ad.span
    npad = Ad.data.shape[1]
    rng = np.random.RandomState(0)
    b = rng.randn(n, s).astype(np.float32)
    x0 = rng.randn(n, s).astype(np.float32)
    dinv = (1.0 / np.asarray(np.abs(A).sum(axis=1)).ravel()
            ).astype(np.float32)
    bpadT = jnp.zeros((s, npad), jnp.float32).at[:, :n].set(b.T)
    dpad = jnp.zeros(npad, jnp.float32).at[:n].set(dinv)
    xlen = dia_xpad_len(npad, lo, Ad.offs, Ad._TILE)
    xpT = jnp.zeros((s, xlen), jnp.float32).at[:, lo:lo + n].set(x0.T)
    xn = np.asarray(dia_jacobi_sweep_multirhs_pallas(
        Ad.data, Ad.offs, xpT, bpadT, dpad, lo, n,
        interpret=True))[:, :n].T
    ref = x0 + dinv[:, None] * (b - A @ x0)
    assert np.abs(xn - ref).max() < 1e-5 * np.abs(ref).max()


def test_dia_multirhs_matvec_fallback_parity():
    """DiaMatrix.matvec on (n, s) input (kernel path where supported,
    XLA shift loop otherwise) matches scipy column-wise."""
    from parelag_tpu.ops.device_sparse import to_dia
    n, s = 4000, 4
    A = sp.diags([4.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1]).tocsr().astype(np.float32)
    Ad = to_dia(A, dtype=np.float32)
    rng = np.random.RandomState(1)
    X = rng.randn(n, s).astype(np.float32)
    y = np.asarray(Ad @ jnp.asarray(X))
    ref = A @ X
    assert np.abs(y - ref).max() < 1e-5 * np.abs(ref).max()


def test_dia_jacobi_sweeps_method_fallback_parity():
    """DiaMatrix.jacobi_sweeps (fused path or None-fallback) and the
    smoother's generic formula agree; on backends without pallas the
    smoother must transparently take the generic path."""
    from parelag_tpu.ops.device_sparse import to_dia
    from parelag_tpu.solvers.smoothers import L1JacobiSmoother
    n = 4000
    A = sp.diags([4.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1]).tocsr().astype(np.float32)
    Ad = to_dia(A, dtype=np.float32)
    dinv = (1.0 / np.asarray(np.abs(A).sum(axis=1)).ravel()
            ).astype(np.float32)
    smo = L1JacobiSmoother(jnp.asarray(dinv), sweeps=2, omega=1.0)
    rng = np.random.RandomState(1)
    b = rng.randn(n).astype(np.float32)
    x0 = rng.randn(n).astype(np.float32)
    out = np.asarray(smo.apply(Ad, jnp.asarray(b), jnp.asarray(x0)),
                     dtype=np.float64)
    x = x0.astype(np.float64)
    A64 = A.astype(np.float64)
    d64 = dinv.astype(np.float64)
    for _ in range(2):
        x = x + d64 * (b - A64 @ x)
    assert np.abs(out - x).max() < 1e-5 * np.abs(x).max()
