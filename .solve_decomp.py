"""Decompose the flagship solve: where do the 100ms/iter go on-chip?
Times each piece of the V-cycle-PCG independently with slope timing."""
import sys, time
import numpy as np

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
sys.argv = ['x']
import bench
import jax
import jax.numpy as jnp

seqs, A, b = bench._build_h1(nx)
from parelag_tpu.solvers.amge_solver import build_amge_hierarchy
from parelag_tpu.solvers.cg import pcg

dtype = np.float32
H, A_levels, P_levels = build_amge_hierarchy(
    seqs, 0, A.astype(dtype), smoother="l1jacobi", sweeps=2,
    dtype=dtype, matrix_format="dia")
Hb = H.cast(jnp.bfloat16)
n = A.shape[0]
bj = jnp.asarray(b.astype(dtype))
rb = bj.astype(jnp.bfloat16)

st = bench._slope_time

def show(name, dt, bytes_est=None):
    line = f"{name:<28}{dt*1e3:9.2f} ms"
    if bytes_est:
        line += f"   {bytes_est/dt/1e9:8.1f} GB/s ({bytes_est/1e6:.0f} MB)"
    print(line, flush=True)

# 1. fine f32 SpMV
A0 = H.levels[0].A
f = jax.jit(lambda M, v: M @ v)
nbytes = bench._op_bytes(A0) + 2 * n * 4
show("fine SpMV f32", st(lambda: f(A0, bj)), nbytes)

# 2. per-level bf16 SpMV
for l, lvl in enumerate(Hb.levels):
    if lvl.A is None:
        continue
    nl = lvl.A.shape[0]
    v = jnp.ones(nl, jnp.bfloat16)
    nbytes = bench._op_bytes(lvl.A) + 2 * nl * 2
    show(f"L{l} SpMV bf16 (n={nl})", st(lambda lv=lvl, vv=v: f(lv.A, vv)),
         nbytes)

# 3. one full bf16 V-cycle
cyc = jax.jit(lambda Hh, r: Hh.apply(r))
show("bf16 V(2,2) cycle", st(lambda: cyc(Hb, rb)),
     bench._cycle_bytes(Hb, sweeps=2))

# 4. f32 V-cycle (no cast)
show("f32 V(2,2) cycle", st(lambda: cyc(H, bj)),
     bench._cycle_bytes(H, sweeps=2))

# 5. smoother-only at L0 (2 sweeps)
sm = jax.jit(lambda Hh, r: Hh.levels[0].pre.apply(
    Hh.levels[0].A, r, jnp.zeros_like(r)))
show("L0 smoother 2 sweeps bf16", st(lambda: sm(Hb, rb)))

# 5b. transfers per level (R and P applications)
g = jax.jit(lambda M, v: M @ v)
for l, lvl in enumerate(Hb.levels):
    if lvl.R is None:
        continue
    nf = lvl.R.shape[1]; nc = lvl.R.shape[0]
    vf = jnp.ones(nf, jnp.bfloat16); vc = jnp.ones(nc, jnp.bfloat16)
    print(f"L{l} R type {type(lvl.R).__name__} P type {type(lvl.P).__name__}", flush=True)
    show(f"L{l} R@r (nf={nf})", st(lambda M=lvl.R, v=vf: g(M, v)),
         bench._op_bytes(lvl.R) + (nf + nc) * 2)
    show(f"L{l} P@e (nc={nc})", st(lambda M=lvl.P, v=vc: g(M, v)),
         bench._op_bytes(lvl.P) + (nf + nc) * 2)

# 6. full PCG solve (reference)
@jax.jit
def solve(Harg, Hbarg, bb):
    def precond(r):
        return Hbarg.apply(r.astype(jnp.bfloat16)).astype(jnp.float32)
    return pcg(lambda v: Harg.levels[0].A @ v, bb, precond=precond,
               rtol=1e-5, atol=0.0, maxiter=100)
x, (it, _) = solve(H, Hb, bj)
niter = int(it)
dt = st(lambda: solve(H, Hb, bj)[0])
show(f"full PCG ({niter} iters)", dt)
show("  per iteration", dt / max(niter, 1))
