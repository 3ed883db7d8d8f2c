"""Decompose the flagship solve from CACHED levels (skips AMGe setup)."""
import sys, time
import numpy as np
import scipy.sparse as sp

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
sys.argv = ['x']
import bench
import jax
import jax.numpy as jnp
from parelag_tpu.solvers.hierarchy import build_hierarchy
from parelag_tpu.solvers import smoothers as sm
from parelag_tpu.solvers.cg import pcg

z = np.load(f"/tmp/h{nx}_levels.npz")
nlev = int(z["nlev"])
b = z["b"]


def csr(pre):
    return sp.csr_matrix((z[pre + "_data"], z[pre + "_indices"],
                          z[pre + "_indptr"]), shape=tuple(z[pre + "_shape"]))


A_levels = [csr(f"A{l}").astype(np.float32) for l in range(nlev)]
P_levels = [csr(f"P{l}").astype(np.float32) for l in range(nlev - 1)]

t0 = time.time()
H = build_hierarchy(A_levels, P_levels,
                    lambda A, l: sm.make_l1_jacobi(A, sweeps=2),
                    dtype=np.float32, matrix_format="dia",
                    transfer_dtype=jnp.bfloat16)
print(f"hierarchy build+ship {time.time()-t0:.1f}s", flush=True)
Hb = H.cast(jnp.bfloat16)
n = A_levels[0].shape[0]
bj = jnp.asarray(b.astype(np.float32))
rb = bj.astype(jnp.bfloat16)
st = bench._slope_time


def show(name, dt, bytes_est=None):
    line = f"{name:<28}{dt*1e3:9.2f} ms"
    if bytes_est:
        line += f"   {bytes_est/dt/1e9:8.1f} GB/s ({bytes_est/1e6:.0f} MB)"
    print(line, flush=True)


f = jax.jit(lambda M, v: M @ v)
show("fine SpMV f32", st(lambda: f(H.levels[0].A, bj)),
     bench._op_bytes(H.levels[0].A) + 2 * n * 4)

cyc = jax.jit(lambda Hh, r: Hh.apply(r))
show("bf16 V(2,2) cycle", st(lambda: cyc(Hb, rb)),
     bench._cycle_bytes(Hb, sweeps=2))

g = jax.jit(lambda M, v: M @ v)
for l, lvl in enumerate(Hb.levels):
    if lvl.R is None:
        continue
    nf = lvl.R.shape[1]; nc = lvl.R.shape[0]
    vf = jnp.ones(nf, jnp.bfloat16); vc = jnp.ones(nc, jnp.bfloat16)
    print(f"L{l} R {type(lvl.R).__name__} P {type(lvl.P).__name__}",
          flush=True)
    show(f"L{l} R@r (nf={nf})", st(lambda M=lvl.R, v=vf: g(M, v)),
         bench._op_bytes(lvl.R) + (nf + nc) * 2)
    show(f"L{l} P@e (nc={nc})", st(lambda M=lvl.P, v=vc: g(M, v)),
         bench._op_bytes(lvl.P) + (nf + nc) * 2)


@jax.jit
def solve(A0, Hbarg, bb):
    def precond(r):
        return Hbarg.apply(r.astype(jnp.bfloat16)).astype(jnp.float32)
    return pcg(lambda v: A0 @ v, bb, precond=precond,
               rtol=1e-5, atol=0.0, maxiter=100)


x, (it, _) = solve(H.levels[0].A, Hb, bj)
niter = int(it)
xh = np.asarray(x, np.float64)
rel = np.linalg.norm(b - A_levels[0].astype(np.float64) @ xh) \
    / np.linalg.norm(b)
dt = st(lambda: solve(H.levels[0].A, Hb, bj)[0])
show(f"full PCG ({niter} iters, rel={rel:.2e})", dt)
show("  per iteration", dt / max(niter, 1))
print(f"dof_iter/s = {n*niter/dt/1e6:.1f}M", flush=True)
