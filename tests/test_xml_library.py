"""Solver-library completeness against the reference's OWN sample XMLs.

Every named solver in every XML under examples/example_parameterlists/ and
src/linalg/MG/sample_parameterlists/ is parsed with read_xml, built through
the SolverLibrary against the appropriate operator (the form named by the
file / the Forms parameter), and applied; driver entries must actually
solve their system. This is the CTest-style acceptance the reference gets
from solver_lib_test + the per-example XML runs.
"""

import glob
import os

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from parelag_tpu.utils.params import read_xml
from parelag_tpu.solvers.library import (
    SolverLibrary, SolverState, Block2x2Operator)

REF_XML_DIRS = [
    "/root/reference/examples/example_parameterlists",
    "/root/reference/src/linalg/MG/sample_parameterlists",
]

# driver entries per XML: (entry name, problem kind)
#   kind "scalarN" -> N-form operator M + D^T W D (ess BC eliminated)
#   kind "block"   -> Darcy saddle Block2x2Operator
DRIVERS = {
    # NOTE: the CG_PCG-AMG / PCG-AMG / PCG-AMS / PCG-ADS entries are the
    # reference's 3-iteration coarse components ("Maximum iterations" 3,
    # used as "Coarse solver" inside the AMGe entries) -> error-reduction
    # criterion. They converged fully in round 2 only because the
    # AMG/AMS/ADS types aliased to an exact direct solve; with the native
    # AMGe/Hiptmair hierarchy backing them they behave like the
    # reference's inexact hypre preconditioners.
    "0form_example_parameters.xml": [
        ("PCG-AMGe-GS", "scalar0"),
        ("PCG-BoomerAMG", "scalar0"),
        ("CG_PCG-AMG", "scalar0:reduce"),
        ("SuperLU", "scalar0"),
    ],
    "1form_example_parameters.xml": [
        ("PCG with AMGe-GS Preconditioner", "scalar1"),
        ("PCG with Auxiliary Space Preconditioner", "scalar1"),
        ("PCG-AMG", "scalar1:reduce"),
        ("PCG-AMS", "scalar1:reduce"),
    ],
    "2form_example_parameters.xml": [
        ("PCG with AMGe-GS Preconditioner", "scalar2"),
        ("PCG with Auxiliary Space Preconditioner", "scalar2"),
        ("PCG-AMG", "scalar2:reduce"),
        ("PCG-ADS", "scalar2:reduce"),
    ],
    "darcy_example_parameters.xml": [
        ("GMRES-AMGe-BlkJacobi-GS-AMG", "block"),
        ("GMRES-BlkJacobi-GS-AMG_CG", "block"),
    ],
    "spe10_example_parameters.xml": [
        ("GMRES-Block-LDU-AMGe-GS", "block"),
        # PCG-GS is a 3-iteration inner/coarse component (rtol=0 in the
        # XML) -> error-reduction criterion, not full convergence
        ("PCG-GS", "scalar2:reduce"),
    ],
    "amge_blocked.xml": [
        ("My AMGe Solver", "block:precond"),
        ("Block Gauss-Seidel with GS and BoomerAMG", "block:precond"),
        ("Coarse Grid GMRES", "block:reduce"),   # maxiter=3, rtol=0 inner
    ],
    "block-2x2-gauss-seidel.xml": [
        ("Block Gauss-Seidel with GS and BoomerAMG", "block:precond"),
    ],
    "bramble-pasciak-blocked.xml": [
        ("Bramble-Pasciak BoomerAMG MINRES", "block"),
        # NOTE: the XML's "Block Jacobi MINRES" names a preconditioner
        # entry ("Block Jacobi BoomerAMG") that does not exist in the file
        # (dangling reference in the reference's own sample); the existing
        # "Block Jacobi GS" entry is exercised instead
        ("Block Jacobi GS", "block:precond"),
    ],
    "bramble-pasciak-monolithic.xml": [
        ("Bramble-Pasciak BoomerAMG MINRES", "block"),
        ("BoomerAMG MINRES", "block"),
    ],
}

_CACHE = {}


def _scalar_problem(form):
    if ("scalar", form) in _CACHE:
        return _CACHE[("scalar", form)]
    from parelag_tpu.models.multigrid import build_seq_hierarchy
    from parelag_tpu.models.upscaling import (
        mark_dofs_on_bndr, boundary_rhs, eliminate_rowcols)
    mesh, topos, seqs = build_seq_hierarchy(nref_parallel=1)
    s = seqs[0]
    M = s.compute_mass_operator(form)
    W = s.compute_mass_operator(form + 1)
    D = s.D[form]
    A = (M + D.T @ W @ D).tocsr()
    nat = {1: (1.0, 1.0, 1.0)} if form == 1 else {1: -1.0}
    b = boundary_rhs(s, form, nat)
    marker = mark_dofs_on_bndr(s, form, {2, 3, 4, 5})
    A, b = eliminate_rowcols(A, b, marker, np.zeros(A.shape[0]))
    _CACHE[("scalar", form)] = (A, b, seqs)
    return _CACHE[("scalar", form)]


def _block_problem():
    if "block" in _CACHE:
        return _CACHE["block"]
    from parelag_tpu.models.darcy import build_darcy_hierarchy
    from parelag_tpu.amge import hexfe
    mesh, topos, seqs = build_darcy_hierarchy(
        nref_parallel=1, partition="derefine", aggressive_levels=0)
    s = seqs[0]
    M = s.compute_mass_operator(2)
    W = s.compute_mass_operator(3)
    B = (W @ s.D[2]).tocsr()
    op = Block2x2Operator(M, B.T.tocsr(), B)
    vols = hexfe.hex_volumes(mesh.vertices[mesh.elements])
    b = np.concatenate([np.zeros(M.shape[0]), vols])
    _CACHE["block"] = (op, b, seqs)
    return _CACHE["block"]


def _all_cases():
    cases = []
    for d in REF_XML_DIRS:
        for f in sorted(glob.glob(os.path.join(d, "*.xml"))):
            base = os.path.basename(f)
            for entry, kind in DRIVERS.get(base, []):
                cases.append(pytest.param(f, entry, kind,
                                          id=f"{base}::{entry}"))
    return cases


@pytest.mark.parametrize("path,entry,kind", _all_cases())
def test_reference_xml_solver(path, entry, kind):
    import warnings
    kind, _, crit = kind.partition(":")
    pl = read_xml(path)
    lib = SolverLibrary(pl.sublist("Preconditioner Library"))
    fac = lib.get_solver_factory(entry)

    if kind.startswith("scalar"):
        form = int(kind[-1])
        op, b, seqs = _scalar_problem(form)
        state = SolverState(seqs, [form])
        A = op
    else:
        op, b, seqs = _block_problem()
        state = SolverState(seqs, [2, 3])
        A = op.monolithic()

    solver = fac.build_solver(op, state)
    if not crit:
        crit = ("solve" if fac.type in (
            "Krylov", "Direct", "BoomerAMG", "AMS", "ADS",
            "Bramble-Pasciak") else "reduce")

    if crit == "precond":
        # entry is a preconditioner composition: an outer FGMRES wrapped
        # around it must converge (the reference uses these inside Krylov)
        Mop = spla.LinearOperator(
            A.shape, matvec=lambda r: np.asarray(
                solver.apply(np.asarray(r, dtype=np.float64)),
                dtype=np.float64))
        x, info = spla.gmres(A, b, M=Mop, rtol=1e-8, restart=50,
                             maxiter=200)
        assert info == 0
        assert np.linalg.norm(b - A @ x) < 1e-6 * np.linalg.norm(b)
        return

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # inner maxiter caps
        x = np.asarray(solver.solve(b), dtype=np.float64)
    res = np.linalg.norm(b - A @ x)
    if crit == "solve":
        assert res < 1e-4 * np.linalg.norm(b), res
    else:
        # inner/coarse components (capped iterations): error reduction
        assert res < np.linalg.norm(b), res


def test_all_reference_xmls_parse():
    """Every XML in both reference directories parses into a ParameterList
    with a Preconditioner Library sublist."""
    n = 0
    for d in REF_XML_DIRS:
        for f in sorted(glob.glob(os.path.join(d, "*.xml"))):
            pl = read_xml(f)
            lib = pl.sublist("Preconditioner Library", create=False)
            assert lib is not None, f
            n += 1
    assert n == 9
