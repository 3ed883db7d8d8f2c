"""Blocked-layout pallas DIA kernel vs production, repeated measurements."""
import sys
import numpy as np
sys.argv = ['x']
import bench
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

st = bench._slope_time
n = 917504
nd = 27
lo = hi = 9507
offs = sorted({dz + 97 * dy + 9409 * dx for dz in (-1, 0, 1)
               for dy in (-1, 0, 1) for dx in (-1, 0, 1)})
data = jnp.asarray(np.random.rand(nd, n).astype(np.float32))
xpad = jnp.asarray(np.random.rand(n + lo + hi).astype(np.float32))
nbytes = nd * n * 4


def show(name, fn, reps=3):
    try:
        np.asarray(fn())
        for r in range(reps):
            dt = st(fn)
            print(f"{name:<26} r{r} {dt*1e3:8.2f} ms  "
                  f"{nbytes/dt/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"{name:<26} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def make_blocked(tile):
    nsteps = n // tile
    db = data.reshape(nd, nsteps, tile).transpose(1, 0, 2).copy()

    def kernel(x_ref, d_ref, y_ref):
        base = pl.program_id(0) * tile
        acc = None
        for d in range(nd):
            w = x_ref[pl.ds(base + lo + offs[d], tile)]
            t = d_ref[0, d, :] * w
            acc = t if acc is None else acc + t
        y_ref[:] = acc

    fn = pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nd, tile), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32))
    j = jax.jit(fn)
    return lambda: j(xpad, db)


# production-shape kernel for comparison (strided layout)
def make_strided(tile):
    nsteps = n // tile

    def kernel(x_ref, d_ref, y_ref):
        base = pl.program_id(0) * tile
        acc = None
        for d in range(nd):
            w = x_ref[pl.ds(base + lo + offs[d], tile)]
            t = d_ref[d, :] * w
            acc = t if acc is None else acc + t
        y_ref[:] = acc

    fn = pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((nd, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32))
    j = jax.jit(fn)
    return lambda: j(xpad, data)


show("strided t=8192", make_strided(8192))
show("blocked t=8192", make_blocked(8192))
show("blocked t=16384", make_blocked(16384))
show("blocked t=32768", make_blocked(32768))
