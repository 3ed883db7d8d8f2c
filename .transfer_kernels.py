"""On-chip experiment: transfer-operator (P/R) matvec variants.

Times, per saved level matrix, several device layouts/kernels:
  ell      - current EllMatrix fallback (scalar gathers)
  bcsr     - current BcsrMatrix einsum
  bcsr_vpu - BCSR with multiply+reduce instead of dot_general
  cootile  - COO-of-tiles + segment_sum
"""
import sys, time
import numpy as np
import scipy.sparse as sp

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
which = sys.argv[2] if len(sys.argv) > 2 else "P0,R0,P1,R1"
sys.argv = ['x']
import bench
import jax
import jax.numpy as jnp
from parelag_tpu.ops.device_sparse import from_scipy, to_bcsr, BcsrMatrix

z = np.load(f"/tmp/h{nx}_levels.npz")
st = bench._slope_time
DT = jnp.bfloat16


def load(name):
    l = int(name[1])
    pre = f"P{l}_"
    M = sp.csr_matrix((z[pre + "data"], z[pre + "indices"],
                       z[pre + "indptr"]), shape=tuple(z[pre + "shape"]))
    if name[0] == "R":
        M = M.T.tocsr()
    return M


def bcsr_vpu_matvec(B, x):
    m_pad = B.padded[1]
    xp = jnp.zeros(m_pad, x.dtype).at[: B.shape[1]].set(x)
    xb = xp.reshape(-1, B.BC)
    g = xb[B.col_blocks]                      # (nbr, kb, 128)
    y = (B.tiles * g[:, :, None, :]).sum(axis=(1, 3))
    return y.reshape(-1)[: B.shape[0]]


def to_cootile(A, dtype):
    A = sp.csr_matrix(A)
    n, m = A.shape
    br, bc = 8, 128
    coo = A.tocoo()
    rb = coo.row.astype(np.int64) // br
    cb = coo.col.astype(np.int64) // bc
    nbc = -(-m // bc)
    key = rb * nbc + cb
    uk, inv = np.unique(key, return_inverse=True)
    tiles = np.zeros((uk.size, br, bc), dtype)
    tiles[inv, coo.row % br, coo.col % bc] = coo.data
    return (jnp.asarray((uk // nbc).astype(np.int32)),
            jnp.asarray((uk % nbc).astype(np.int32)),
            jnp.asarray(tiles), (n, m), (-(-n // br)) )


def cootile_matvec(rb, cb, tiles, shape, nbr, x):
    n, m = shape
    m_pad = -(-m // 128) * 128
    xp = jnp.zeros(m_pad, x.dtype).at[:m].set(x)
    xb = xp.reshape(-1, 128)
    g = xb[cb]                                # (ntiles, 128)
    part = (tiles * g[:, None, :]).sum(axis=2)   # (ntiles, 8)
    y = jax.ops.segment_sum(part, rb, num_segments=nbr,
                            indices_are_sorted=True)
    return y.reshape(-1)[:n]


for name in which.split(","):
    M = load(name)
    n, m = M.shape
    x = jnp.asarray(np.random.rand(m).astype(np.float32)).astype(DT)
    print(f"== {name} {n}x{m} nnz={M.nnz}", flush=True)
    f = jax.jit(lambda A, v: A @ v)

    E = from_scipy(M, dtype=DT)
    eb = bench._op_bytes(E)
    dt = st(lambda: f(E, x))
    print(f"  ell       {dt*1e3:8.2f} ms  {eb/dt/1e9:6.1f} GB/s ({eb/1e6:.0f} MB)", flush=True)

    B = to_bcsr(M, dtype=DT)
    bb = bench._op_bytes(B)
    kb = B.col_blocks.shape[1]
    dt = st(lambda: f(B, x))
    print(f"  bcsr(kb={kb}) {dt*1e3:8.2f} ms  {bb/dt/1e9:6.1f} GB/s ({bb/1e6:.0f} MB)", flush=True)

    g = jax.jit(bcsr_vpu_matvec)
    dt = st(lambda: g(B, x))
    print(f"  bcsr_vpu  {dt*1e3:8.2f} ms  {bb/dt/1e9:6.1f} GB/s", flush=True)

    rb, cb, tiles, shp, nbr = to_cootile(M, np.float32)
    tiles = tiles.astype(DT)
    ct = tiles.size * 2 + rb.size * 8
    h = jax.jit(lambda rb, cb, t, v: cootile_matvec(rb, cb, t, shp, nbr, v))
    dt = st(lambda: h(rb, cb, tiles, x))
    print(f"  cootile   {dt*1e3:8.2f} ms  {ct/dt/1e9:6.1f} GB/s ({ct/1e6:.0f} MB)", flush=True)
