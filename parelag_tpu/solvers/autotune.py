"""Cycle-shape autotuning: measure a small grid of multigrid cycle
configurations (V vs W(mu), smoother family, sweep counts) on the actual
device and pick the fastest time-to-tolerance.

The reference exposes these knobs through its XML solver library (cycle
type / relaxation choices per ParELAG_Hierarchy.hpp:114 "mu" and the
HypreSmootherFactory type map, ParELAG_HypreSmootherFactory.cpp:73-84) and
leaves the choice to the user; here the hierarchy transfer operators
(A_levels / P_levels) are fixed once and only the cheap parts — smoother
coefficients and the cycle recursion shape — are swapped per candidate, so
an exhaustive measurement over the default grid costs a few solves.

Typical use (the bench's W-cycle/aggressive-smoothing autotune lane):

    best, table = tune_cycle(A_levels, P_levels, b)
    H = best["hierarchy"]          # ready-to-use device Hierarchy
"""

import time

import numpy as np

from parelag_tpu.solvers.hierarchy import build_hierarchy
from parelag_tpu.solvers import smoothers as sm
from parelag_tpu.solvers.cg import pcg


DEFAULT_GRID = (
    dict(mu=1, smoother="l1jacobi", sweeps=1),
    dict(mu=1, smoother="l1jacobi", sweeps=2),
    dict(mu=1, smoother="chebyshev", degree=2),
    dict(mu=1, smoother="chebyshev", degree=3),
    dict(mu=2, smoother="l1jacobi", sweeps=1),
    dict(mu=2, smoother="chebyshev", degree=2),
)


def _factory(cfg):
    if cfg["smoother"] == "l1jacobi":
        return lambda A, l: sm.make_l1_jacobi(A, sweeps=cfg.get("sweeps", 1))
    if cfg["smoother"] == "chebyshev":
        return lambda A, l: sm.make_chebyshev(A, degree=cfg.get("degree", 3))
    raise ValueError(cfg["smoother"])


def tune_cycle(A_levels, P_levels, b, candidates=DEFAULT_GRID, rtol=1e-5,
               dtype=np.float32, matrix_format="auto", maxiter=200,
               precond_dtype=None, repeats=3):
    """Time PCG-to-rtol for each cycle candidate on device; return
    (best, table) where best/table rows carry cfg, iters, solve_s and the
    winning row also its built `hierarchy`. Candidates that fail to reach
    rtol within maxiter are kept in the table (converged=False) but never
    win. b: host rhs for the fine operator A_levels[0]."""
    import jax
    import jax.numpy as jnp

    A0 = A_levels[0]
    bj = jnp.asarray(np.asarray(b).astype(dtype))
    nrm0 = float(np.linalg.norm(np.asarray(b)))
    table = []
    for cfg in candidates:
        H = build_hierarchy(
            [a.astype(dtype) for a in A_levels],
            [p.astype(dtype) for p in P_levels],
            _factory(cfg), mu=cfg.get("mu", 1), dtype=dtype,
            matrix_format=matrix_format)
        Hp = H.cast(precond_dtype) if precond_dtype is not None else H

        @jax.jit
        def solve(Harg, Hparg, bb):
            def precond(r):
                if precond_dtype is not None:
                    return Hparg.apply(
                        r.astype(precond_dtype)).astype(bb.dtype)
                return Hparg.apply(r)
            return pcg(lambda v: Harg.levels[0].A @ v, bb,
                       precond=precond, rtol=rtol, atol=0.0,
                       maxiter=maxiter)

        try:
            x, (it, _) = solve(H, Hp, bj)
            niter = int(it)
            res = float(np.linalg.norm(
                np.asarray(b)
                - A0 @ np.asarray(x, dtype=np.float64)))
            converged = niter < maxiter and res <= 10 * rtol * max(
                nrm0, 1e-30)
            # forced-sync timing: np.asarray(x) actually waits (this
            # stack's block_until_ready does not)
            ts = []
            for _ in range(max(1, repeats)):
                t0 = time.time()
                np.asarray(solve(H, Hp, bj)[0])
                ts.append(time.time() - t0)
            dt = min(ts)
        except Exception as e:            # pragma: no cover
            table.append(dict(cfg=cfg, error=str(e), converged=False))
            continue
        table.append(dict(cfg=cfg, iters=niter, solve_s=dt,
                          rel_res=res / max(nrm0, 1e-30),
                          converged=converged, hierarchy=H))
    ok = [row for row in table if row.get("converged")]
    best = min(ok, key=lambda r: r["solve_s"]) if ok else None
    for row in table:                     # only the winner keeps its H
        if row is not best and "hierarchy" in row:
            del row["hierarchy"]
    return best, table
