"""Round 2: correctness check + BR/BC sweep for the VPU BCSR matvec."""
import sys
import numpy as np
import scipy.sparse as sp

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
which = sys.argv[2] if len(sys.argv) > 2 else "P0,R0"
sys.argv = ['x']
import bench
import jax
import jax.numpy as jnp

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


def to_bcsr_g(A, dtype, br, bc):
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    n, m = A.shape
    n_pad = -(-n // br) * br
    m_pad = -(-m // bc) * bc
    nbr = n_pad // br
    nbc = m_pad // bc
    coo = A.tocoo()
    rb = coo.row.astype(np.int64) // br
    cbid = coo.col.astype(np.int64) // bc
    key = rb * nbc + cbid
    uk, inv = np.unique(key, return_inverse=True)
    urb = uk // nbc
    ucb = uk % nbc
    counts = np.bincount(urb, minlength=nbr)
    kb = int(max(counts.max() if counts.size else 1, 1))
    start = np.zeros(nbr + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    slot_of_uk = np.arange(uk.size, dtype=np.int64) - start[urb]
    col_blocks = np.zeros((nbr, kb), dtype=np.int32)
    col_blocks[urb, slot_of_uk] = ucb
    tiles = np.zeros(nbr * kb * br * bc, dtype=dtype)
    flat = (((rb * kb + slot_of_uk[inv]) * br
             + coo.row.astype(np.int64) % br) * bc
            + coo.col.astype(np.int64) % bc)
    tiles[flat] = coo.data
    return (jnp.asarray(col_blocks),
            jnp.asarray(tiles.reshape(nbr, kb, br, bc)),
            (n, m), (n_pad, m_pad), kb)


def vpu_matvec(col_blocks, tiles, shape, padded, x, bc):
    m_pad = padded[1]
    xp = jnp.zeros(m_pad, x.dtype).at[: shape[1]].set(x)
    xb = xp.reshape(-1, bc)
    g = xb[col_blocks]
    y = (tiles * g[:, :, None, :]).sum(axis=(1, 3))
    return y.reshape(-1)[: shape[0]]


for name in which.split(","):
    M = load(name)
    n, m = M.shape
    xh = np.random.rand(m).astype(np.float32)
    x = jnp.asarray(xh).astype(DT)
    ref = M.astype(np.float32) @ np.asarray(x, np.float32)
    print(f"== {name} {n}x{m} nnz={M.nnz}", flush=True)
    for br, bc in ((8, 128), (16, 128), (32, 128), (8, 32), (16, 32)):
        cbk, tiles, shp, pad, kb = to_bcsr_g(M, np.float32, br, bc)
        tiles = tiles.astype(DT)
        nb = tiles.size * 2 + cbk.size * 4
        f = jax.jit(lambda c, t, v, bc=bc, shp=shp, pad=pad:
                    vpu_matvec(c, t, shp, pad, v, bc))
        y = np.asarray(f(cbk, tiles, x), np.float32)
        err = np.linalg.norm(y - ref) / max(np.linalg.norm(ref), 1e-30)
        dt = st(lambda: f(cbk, tiles, x))
        print(f"  br={br:<3}bc={bc:<4} kb={kb:<3} {dt*1e3:8.2f} ms "
              f"{nb/dt/1e9:6.1f} GB/s ({nb/1e6:.0f} MB) relerr={err:.2e}",
              flush=True)
