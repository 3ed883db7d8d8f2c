"""Fine-A DIA SpMV variants on the real chip (from cached levels)."""
import sys
import numpy as np
import scipy.sparse as sp

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
sys.argv = ['x']
import bench
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from parelag_tpu.ops.device_sparse import to_dia

z = np.load(f"/tmp/h{nx}_levels.npz")
A = sp.csr_matrix((z["A0_data"], z["A0_indices"], z["A0_indptr"]),
                  shape=tuple(z["A0_shape"])).astype(np.float32)
n = A.shape[0]
x = jnp.asarray(np.random.rand(n).astype(np.float32))
st = bench._slope_time
D = to_dia(A, dtype=np.float32)
ref = A @ np.asarray(x)
nbytes = D.data.size * 4 + 2 * n * 4


def show(name, fn):
    y = np.asarray(fn(), np.float32)[:n]
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    dt = st(fn)
    print(f"{name:<24}{dt*1e3:8.2f} ms  {nbytes/dt/1e9:6.1f} GB/s "
          f"err={err:.1e}", flush=True)


# 1. current production matvec (pallas, tile 8192)
f0 = jax.jit(lambda M, v: M @ v)
show("prod (pallas t=8192)", lambda: f0(D, x))

# 2. XLA unrolled shifts (bypass pallas)
lo, hi = D.span
m = D.shape[1]


@jax.jit
def xla_shift(data, v):
    xpad = jnp.zeros(lo + m + hi, v.dtype).at[lo:lo + m].set(v)
    y = jnp.zeros(n, jnp.float32)
    for d, off in enumerate(D.offs):
        w = jax.lax.slice_in_dim(xpad, lo + off, lo + off + n, axis=0)
        y = y + data[d, :n] * w
    return y


show("xla unrolled", lambda: xla_shift(D.data, x))


# 3/4. pallas with bigger tiles
def make_pallas(tile):
    nd = D.data.shape[0]
    npad = -(-n // tile) * tile
    data = D.data
    if data.shape[1] != npad:
        data = jnp.pad(data, ((0, 0), (0, npad - data.shape[1])))
    offs = tuple(int(o) for o in D.offs)
    xlen = npad + lo + hi

    def kernel(x_ref, d_ref, y_ref):
        base = pl.program_id(0) * tile
        acc = d_ref[0, :] * x_ref[pl.ds(base + lo + offs[0], tile)]
        for d in range(1, nd):
            acc = acc + d_ref[d, :] * x_ref[pl.ds(base + lo + offs[d],
                                                  tile)]
        y_ref[:] = acc

    fn = pl.pallas_call(
        kernel, grid=(npad // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((nd, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32))

    @jax.jit
    def run(data, v):
        xpad = jnp.zeros(xlen, v.dtype).at[lo:lo + m].set(v)
        return fn(xpad, data)
    return lambda dd=data: run(dd, x)


for tile in (16384, 32768, 65536):
    try:
        show(f"pallas t={tile}", make_pallas(tile))
    except Exception as e:
        print(f"pallas t={tile} failed: {type(e).__name__}", flush=True)


# 5. pallas 2-D: x as (rows,128) in VMEM, per-offset row/lane split loads
# offsets decompose off = 128*q + r; slice rows [base+q, base+q+R+1) and
# combine two lane-shifted loads. Implemented as flat loads of tile+128
# and two static-sliced views to keep alignment.
def make_pallas_al(tile):
    nd = D.data.shape[0]
    npad = -(-n // tile) * tile
    data = D.data
    if data.shape[1] != npad:
        data = jnp.pad(data, ((0, 0), (0, npad - data.shape[1])))
    offs = tuple(int(o) for o in D.offs)
    loal = -(-lo // 128) * 128            # 128-aligned pad
    xlen = npad + loal + -(-hi // 128) * 128 + 128

    def kernel(x_ref, d_ref, y_ref):
        base = pl.program_id(0) * tile
        acc = None
        for d in range(nd):
            off = loal + offs[d]
            q, r = divmod(off, 128)
            w = x_ref[pl.ds(base + q * 128, tile + 128)]
            # two aligned views combined by static slices
            v = jax.lax.slice_in_dim(w, r, r + tile, axis=0)
            t = d_ref[d, :] * v
            acc = t if acc is None else acc + t
        y_ref[:] = acc

    fn = pl.pallas_call(
        kernel, grid=(npad // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((nd, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32))

    @jax.jit
    def run(data, v):
        xpad = jnp.zeros(xlen, v.dtype).at[loal:loal + m].set(v)
        return fn(xpad, data)
    return lambda dd=data: run(dd, x)


for tile in (8192, 32768):
    try:
        show(f"pallas-al t={tile}", make_pallas_al(tile))
    except Exception as e:
        print(f"pallas-al t={tile} failed: {type(e).__name__}: {e}"[:200],
              flush=True)
