"""Krylov solvers (jitted device PCG / host wrapper).

Replaces the reference KrylovSolver wrapper over mfem::CGSolver
(ParELAG_KrylovSolver.hpp:25-144). The convergence criterion matches mfem CG:
stop when r.z <= max(rtol^2 * (r0.z0), atol^2).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def pcg(matvec, b, precond=None, x0=None, rtol=1e-6, atol=1e-12,
        maxiter=500):
    """Preconditioned conjugate gradients, jit-friendly.

    matvec/precond: callables on device vectors. Returns (x, info) where
    info = (niter, final r.z).
    """
    if precond is None:
        precond = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = precond(r)
    d = z
    nom0 = r @ z
    tol2 = jnp.maximum(rtol * rtol * nom0, atol * atol)

    def cond(state):
        x, r, z, d, nom, it = state
        return (nom > tol2) & (it < maxiter)

    def body(state):
        x, r, z, d, nom, it = state
        Ad = matvec(d)
        alpha = nom / (d @ Ad)
        x = x + alpha * d
        r = r - alpha * Ad
        z = precond(r)
        nom_new = r @ z
        beta = nom_new / nom
        d = z + beta * d
        return x, r, z, d, nom_new, it + 1

    x, r, z, d, nom, it = jax.lax.while_loop(
        cond, body, (x, r, z, d, nom0, jnp.asarray(0)))
    return x, (it, nom)


def pcg_host(A_scipy, b, precond=None, rtol=1e-6, atol=1e-12, maxiter=500):
    """Host-convenience wrapper: scipy matrix in, numpy solution out."""
    from parelag_tpu.ops.device_sparse import from_scipy
    A = from_scipy(A_scipy, dtype=np.float64)
    bj = jnp.asarray(b)
    x, info = pcg(A.matvec, bj, precond=precond, rtol=rtol, atol=atol,
                  maxiter=maxiter)
    return np.asarray(x), info
