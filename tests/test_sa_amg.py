"""Smoothed-aggregation AMG tests (solvers/sa_amg.py) — the BoomerAMG
role of the reference's hybridized-Darcy composition ("CG_PCG-AMG",
examples/testing_helpers/CreateDarcyParameterList.hpp:60-80, built by
src/linalg/factories/ParELAG_HybridizationSolverFactory.cpp:135-141).

Covers: SA setup invariants, V-cycle-preconditioned CG with near-flat
iteration counts in h (the capability the one-level facet-block Jacobi
lacked — 263 iterations at 32^3 in BENCH_r04), host/device hierarchy
parity, the BoomerAMG XML type's SA fallback on chain-less operators,
and the library Hybridization type honoring its "Solver" parameter.
"""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import pytest

from parelag_tpu.solvers.sa_amg import (
    strength_filter, aggregate, build_sa_hierarchy,
    build_device_sa_hierarchy, HostVCycle)


def _laplacian3d(nx):
    """7-point Laplacian on an nx^3 grid."""
    e = np.ones(nx)
    T = sp.diags([2 * e, -e[:-1], -e[:-1]], [0, 1, -1])
    I = sp.identity(nx)
    return (sp.kron(sp.kron(T, I), I) + sp.kron(sp.kron(I, T), I)
            + sp.kron(sp.kron(I, I), T)).tocsr()


def test_aggregate_covers_all_nodes():
    A = _laplacian3d(10)
    _, S = strength_filter(A)
    agg = aggregate(S)
    assert agg.shape == (A.shape[0],)
    assert agg.min() == 0
    nc = agg.max() + 1
    # contiguous ids, sensible coarsening ratio for a 7-point stencil
    assert np.unique(agg).size == nc
    assert 10 <= nc <= A.shape[0] // 2


def test_sa_hierarchy_poisson_near_flat_iterations():
    iters = {}
    for nx in (12, 20):
        A = _laplacian3d(nx)
        A_l, P_l = build_sa_hierarchy(A, coarse_size=200)
        assert len(A_l) >= 3
        # Galerkin chain is consistent
        for l in range(len(P_l)):
            d = abs(P_l[l].T @ A_l[l] @ P_l[l] - A_l[l + 1]).max()
            assert d < 1e-10
        M = spla.LinearOperator(A.shape, matvec=HostVCycle(A_l, P_l))
        b = np.random.RandomState(0).rand(A.shape[0])
        it = [0]
        x, info = spla.cg(A, b, M=M, rtol=1e-10, atol=0.0, maxiter=200,
                          callback=lambda _: it.__setitem__(0, it[0] + 1))
        assert info == 0
        res = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
        assert res < 1e-9
        iters[nx] = it[0]
        assert it[0] <= 25, (nx, it[0])
    # near-flat in h (one-level Jacobi would roughly double)
    assert iters[20] <= iters[12] + 6


def test_device_sa_hierarchy_matches_host_cycle():
    A = _laplacian3d(12)
    H, A_l, P_l = build_device_sa_hierarchy(
        A, dtype=np.float64, coarse_size=200)
    host = HostVCycle(A_l, P_l, sweeps=2)
    r = np.random.RandomState(1).rand(A.shape[0])
    dev = np.asarray(H.cycle(r))
    ref = host(r)
    # same algorithm modulo smoother details (both l1-Jacobi, same
    # sweeps): demand close agreement, not bitwise equality
    assert np.abs(dev - ref).max() < 1e-8 * np.abs(ref).max()


def test_boomeramg_type_sa_fallback_on_chainless_operator():
    """The BoomerAMG XML type on an operator with NO matching sequence
    chain must build a real (multilevel SA) hierarchy, not a direct
    solve — hypre's BoomerAMG is purely algebraic and the reference
    composes it on the hybridized multiplier system."""
    from parelag_tpu.solvers.library import SolverLibrary, SolverState
    A = _laplacian3d(16)          # 4096 rows > _SA_MIN_SIZE
    lib = SolverLibrary.create_library({
        "AMG": {"Type": "BoomerAMG", "Solver Parameters": {}},
        "PCG-AMG": {"Type": "Krylov", "Solver Parameters": {
            "Solver name": "PCG", "Preconditioner": "AMG",
            "Relative tolerance": 1e-10, "Maximum iterations": 200}},
    })
    solver = lib.get_solver_factory("PCG-AMG").build_solver(
        A, SolverState())
    b = np.random.RandomState(2).rand(A.shape[0])
    x = solver.solve(b)
    assert np.linalg.norm(b - A @ x) < 1e-8 * np.linalg.norm(b)
    assert solver.iterations <= 25
    assert solver._prec._H is not None, "SA hierarchy was not built"
    assert len(solver._prec._H.levels) >= 2


@pytest.mark.slow
def test_hybridization_multiplier_amg_near_flat():
    """SA-AMG preconditioned multiplier solve: near-flat iteration
    counts in h (VERDICT round-4 item 3's acceptance shape)."""
    from parelag_tpu.mesh.mesh import hex_grid_mesh
    from parelag_tpu.topology.topology import AgglomeratedTopology
    from parelag_tpu.amge.fespace import DeRhamSequenceFE
    from parelag_tpu.amge.hybridization import HybridHdivL2
    from parelag_tpu.amge import hexfe
    iters = {}
    for nx in (8, 12):
        mesh = hex_grid_mesh(nx, nx, nx)
        topo = AgglomeratedTopology.from_mesh(mesh)
        seq = DeRhamSequenceFE(topo, mesh)
        seq.jform_start = 2
        hyb = HybridHdivL2(seq)
        vols = hexfe.hex_volumes(mesh.vertices[mesh.elements])
        rhs_u = np.zeros(seq.dof[2].ndofs)
        u0, p0 = hyb.solve(rhs_u, vols, solver="direct", rescale=True)
        u1, p1 = hyb.solve(rhs_u, vols, solver="amg", rtol=1e-10,
                           rescale=True)
        assert np.abs(u1 - u0).max() < 1e-7 * max(np.abs(u0).max(), 1e-30)
        iters[nx] = hyb.last_iterations
        assert hyb.last_iterations <= 40, (nx, hyb.last_iterations)
    assert iters[12] <= iters[8] + 8


@pytest.mark.slow
def test_hybridization_xml_composed_inner_solver():
    """The library Hybridization type honors its "Solver" parameter:
    the named CG_PCG-AMG (Krylov PCG + BoomerAMG) is built on the
    reduced multiplier system and used for the solve — the reference's
    exact composition (CreateDarcyParameterList.hpp:60-80)."""
    from parelag_tpu.solvers.library import SolverLibrary, SolverState
    from parelag_tpu.models.darcy import build_darcy_hierarchy
    from parelag_tpu.amge import hexfe
    mesh, topos, seqs = build_darcy_hierarchy(nref_parallel=1)
    s = seqs[0]
    vols = hexfe.hex_volumes(mesh.vertices[mesh.elements])
    lib = SolverLibrary.create_library({
        "Hybridization-Darcy": {"Type": "Hybridization",
                                "Solver Parameters": {
                                    "Forms": [2, 3],
                                    "Solver": "CG_PCG-AMG",
                                    "RescaleIteration": 1}},
        "CG_PCG-AMG": {"Type": "Krylov", "Solver Parameters": {
            "Solver name": "PCG", "Preconditioner": "BoomerAMG Solver",
            "Maximum iterations": 300, "Relative tolerance": 1e-10}},
        "BoomerAMG Solver": {"Type": "BoomerAMG",
                             "Solver Parameters": {}},
    })
    state = SolverState(seqs, [2, 3])
    solver = lib.get_solver_factory(
        "Hybridization-Darcy").build_solver(None, state)
    assert solver._inner_solver is not None, \
        "the named inner solver was not composed"
    b = np.concatenate([np.zeros(s.dof[2].ndofs), vols])
    x = solver.solve(b)
    assert solver.iterations > 0
    M = s.compute_mass_operator(2)
    W = s.compute_mass_operator(3)
    B = (W @ s.D[2]).tocsr()
    A = sp.bmat([[M, B.T], [B, None]], format="csc")
    xref = spla.spsolve(A, b)
    assert np.abs(x - xref).max() < 1e-6 * max(np.abs(xref).max(), 1.0)
