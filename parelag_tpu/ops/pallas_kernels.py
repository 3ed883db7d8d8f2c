"""Pallas TPU kernels for solve-phase hot ops.

The V-cycle/PCG inner loop is dominated by ELL SpMV (gather + row reduce)
and diagonal smoother updates. XLA already fuses the elementwise parts; the
pallas kernels here fuse the gather with the row reduction so the (n, k)
gathered operand never materializes in HBM, and keep x resident in VMEM
across the row tiles.

Kernels degrade gracefully: if the Mosaic lowering of the in-kernel gather
is unsupported on the current backend, callers fall back to the XLA einsum
path in ops.device_sparse (use `ell_matvec_best`). Status on the current
axon TPU stack: the 1D-operand gather fails to lower ("Only 2D gather is
supported"), so the probe returns False and the XLA path is used. The
production fast path is the BCSR layout in ops.device_sparse (block
gathers + batched contraction, ~4x over ELL on v5e) — which compiles fine
PROVIDED the matrices reach jit as arguments, not closure constants
(multi-MB XLA constants trigger pathological compile times on this stack).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _spmv_kernel(x_ref, idx_ref, val_ref, y_ref):
    """One row-tile: y = sum_k val[i,k] * x[idx[i,k]]; x fully in VMEM."""
    x = x_ref[:]
    idx = idx_ref[:]
    vals = val_ref[:]
    g = jnp.take(x, idx, axis=0)            # (TILE, K) vector gather
    y_ref[:] = jnp.sum(vals * g, axis=1)


def ell_spmv_pallas(indices, values, x, tile=256, interpret=False):
    """y[i] = sum_k values[i,k] * x[indices[i,k]] via a row-tiled pallas
    kernel. Rows must be padded to a multiple of `tile` by the caller
    (ops.device_sparse.from_scipy(pad_to=...) handles this)."""
    n, k = values.shape
    assert n % tile == 0, "pad row count to a tile multiple"
    grid = (n // tile,)
    if _HAS_PLTPU and not interpret:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY
                         if x.size > 2 ** 21 else pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((tile,), lambda i: (i,),
                                 memory_space=pltpu.VMEM)
    else:
        in_specs = [
            pl.BlockSpec(x.shape, lambda i: tuple(0 for _ in x.shape)),
            pl.BlockSpec((tile, k), lambda i: (i, 0)),
            pl.BlockSpec((tile, k), lambda i: (i, 0)),
        ]
        out_specs = pl.BlockSpec((tile,), lambda i: (i,))
    return pl.pallas_call(
        _spmv_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((n,), values.dtype),
        interpret=interpret,
    )(x, indices, values)


@functools.lru_cache(maxsize=1)
def pallas_spmv_supported() -> bool:
    """Probe whether the pallas SpMV lowers on the current default backend."""
    try:
        idx = jnp.zeros((256, 4), jnp.int32)
        val = jnp.ones((256, 4), jnp.float32)
        x = jnp.ones((8,), jnp.float32)
        np.asarray(ell_spmv_pallas(idx, val, x))
        return True
    except Exception:
        return False


def ell_matvec_best(A, x):
    """Pallas SpMV when supported and shapes allow, XLA gather otherwise."""
    from parelag_tpu.ops.device_sparse import ell_matvec
    n, k = A.values.shape
    if n % 256 == 0 and pallas_spmv_supported():
        return ell_spmv_pallas(A.indices, A.values, x)[: A.shape[0]]
    return ell_matvec(A, x)
