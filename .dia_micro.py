"""Microbenchmark the pallas DIA kernel internals on the real chip."""
import sys, traceback
import numpy as np
sys.argv = ['x']
import bench
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

st = bench._slope_time
n = 917504                # 112 * 8192
nd = 27
tile = 8192
lo = hi = 9507
data = jnp.asarray(np.random.rand(nd, n).astype(np.float32))
xpad = jnp.asarray(np.random.rand(n + lo + hi).astype(np.float32))
nbytes = nd * n * 4


def show(name, fn):
    try:
        np.asarray(fn())
        dt = st(fn)
        print(f"{name:<28}{dt*1e3:8.2f} ms  {nbytes/dt/1e9:6.1f} GB/s",
              flush=True)
    except Exception as e:
        print(f"{name:<28}FAILED {type(e).__name__}", flush=True)
        tb = traceback.format_exc()
        for ln in tb.splitlines():
            if "Mosaic" in ln or "error" in ln.lower():
                print("   ", ln[:160], flush=True)


# A. data-stream only (no x): acc = sum_d data[d]
def k_stream(d_ref, y_ref):
    acc = d_ref[0, :]
    for d in range(1, nd):
        acc = acc + d_ref[d, :]
    y_ref[:] = acc


fA = pl.pallas_call(
    k_stream, grid=(n // tile,),
    in_specs=[pl.BlockSpec((nd, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n,), jnp.float32))
show("A data-stream only", lambda: jax.jit(fA)(data))

# B. + aligned x reads (same slice each d)
def k_alx(x_ref, d_ref, y_ref):
    base = pl.program_id(0) * tile
    w = x_ref[pl.ds(base + 8192, tile)]       # aligned, fixed offset
    acc = d_ref[0, :] * w
    for d in range(1, nd):
        acc = acc + d_ref[d, :] * w
    y_ref[:] = acc


fB = pl.pallas_call(
    k_alx, grid=(n // tile,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec((nd, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n,), jnp.float32))
show("B + aligned x (1 slice)", lambda: jax.jit(fB)(xpad, data))

# C. + unaligned x reads (27 distinct offsets, like production)
offs = sorted({dz + 97 * dy + 9409 * dx for dz in (-1, 0, 1)
               for dy in (-1, 0, 1) for dx in (-1, 0, 1)})


def k_unal(x_ref, d_ref, y_ref):
    base = pl.program_id(0) * tile
    acc = None
    for d in range(nd):
        w = x_ref[pl.ds(base + lo + offs[d], tile)]
        t = d_ref[d, :] * w
        acc = t if acc is None else acc + t
    y_ref[:] = acc


fC = pl.pallas_call(
    k_unal, grid=(n // tile,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec((nd, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n,), jnp.float32))
show("C + unaligned x (27)", lambda: jax.jit(fC)(xpad, data))

# D. 2-D data layout: (nd, n//128, 128) blocks, x2d aligned rows + roll
# data block per step: (nd, tile//128, 128)
rows = tile // 128


def k_2d(x_ref, d_ref, y_ref):
    base = pl.program_id(0) * rows
    acc = None
    for d in range(nd):
        q, r = divmod(lo + offs[d], 128)
        w = x_ref[pl.ds(base + q, rows + 1), :]
        wr = pltpu.roll(w, -r, 1)
        # lanes r..127 from row i, lanes 0..r-1 from row i+1
        lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        v = jnp.where(lanes < 128 - r, wr[:rows], wr[1:rows + 1])
        t = d_ref[d] * v
        acc = t if acc is None else acc + t
    y_ref[:] = acc


try:
    data2 = data.reshape(nd, n // 128, 128)
    x2 = jnp.asarray(np.random.rand((n + lo + hi + 127) // 128 * 128)
                     .astype(np.float32)).reshape(-1, 128)
    fD = pl.pallas_call(
        k_2d, grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((nd, rows, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.float32))
    show("D 2-D roll", lambda: jax.jit(fD)(x2, data2))
except Exception as e:
    print("D build failed:", type(e).__name__, str(e)[:200], flush=True)
