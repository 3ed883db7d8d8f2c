"""MultigridTest{0,1,2}Form equivalents: AMGe V-cycle solver drivers.

Reference: examples/MultigridTest{0,1,2}Form.cpp — build the multilevel
de Rham hierarchy, assemble A = M + D^T W D for the form, build the AMGe
multigrid solver (V-cycle with smoothers; Hiptmair smoothing for forms 1/2),
and solve. The reference asserts final residual norms of its hypre-smoother
configuration; our acceptance criteria are the solver-family invariants:
convergence to rtol and a bounded V-cycle convergence factor.
"""

from dataclasses import dataclass
import numpy as np
import jax.numpy as jnp

from parelag_tpu.models.upscaling import (
    build_hierarchy as build_seq_hierarchy, mark_dofs_on_bndr,
    boundary_rhs, eliminate_rowcols)
from parelag_tpu.solvers.amge_solver import build_amge_hierarchy
from parelag_tpu.solvers.cg import pcg
from parelag_tpu.ops.device_sparse import from_scipy


@dataclass
class MGResult:
    iterations: int
    final_residual: float
    conv_factor: float
    ndofs: int


def multigrid_test_form(form, nref=2, smoother=None, sweeps=2,
                        rtol=1e-6, atol=1e-12, mu=1,
                        use_pcg=True) -> MGResult:
    mesh, topos, seqs = build_seq_hierarchy(nref_parallel=nref)
    if smoother is None:
        smoother = "hiptmair" if form in (1, 2) else "l1jacobi"

    M = seqs[0].compute_mass_operator(form)
    W = seqs[0].compute_mass_operator(form + 1)
    D = seqs[0].D[form]
    A = (M + D.T @ W @ D).tocsr()
    ess = {2, 3, 4, 5}
    nat = {1: (1.0, 1.0, 1.0)} if form == 1 else {1: -1.0}
    b = boundary_rhs(seqs[0], form, nat)
    marker = mark_dofs_on_bndr(seqs[0], form, ess)
    A, b = eliminate_rowcols(A, b, marker, np.zeros(A.shape[0]))

    H, A_levels, _ = build_amge_hierarchy(
        seqs, form, A, smoother=smoother, sweeps=sweeps, mu=mu)
    A_ell = H.levels[0].A
    bj = jnp.asarray(b)

    r0 = float(np.linalg.norm(b))
    if use_pcg:
        x, (it, nom) = pcg(lambda v: A_ell @ v, bj, precond=H.apply,
                           rtol=rtol, atol=atol, maxiter=200)
        res = float(np.linalg.norm(b - A @ np.asarray(x)))
        it = int(it)
        conv = (res / r0) ** (1.0 / max(it, 1))
    else:
        x = jnp.zeros_like(bj)
        res_hist = [r0]
        it = 0
        while it < 200 and res_hist[-1] > rtol * r0:
            x = H.cycle(bj, x)
            res_hist.append(float(np.linalg.norm(b - A @ np.asarray(x))))
            it += 1
        res = res_hist[-1]
        conv = (res / r0) ** (1.0 / max(it, 1))
    return MGResult(it, res, conv, A.shape[0])
