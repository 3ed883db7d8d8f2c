"""Block LDU / Bramble-Pasciak / MLDivFree solver tests
(reference Block2x2LDUInverseOperator, BramblePasciakSolver, MLDivFree)."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import pytest

from parelag_tpu.models.upscaling import build_hierarchy
from parelag_tpu.solvers.saddle_extra import (
    Block2x2LDU, BramblePasciakCG, MLDivFree)
from parelag_tpu.amge import hexfe


@pytest.fixture(scope="module")
def darcy_system():
    mesh, topos, seqs = build_hierarchy(nref_parallel=1)
    s = seqs[0]
    M = s.compute_mass_operator(2)
    W = s.compute_mass_operator(3)
    B = (W @ s.D[2]).tocsr()
    vols = hexfe.hex_volumes(mesh.vertices[mesh.elements])
    b = np.concatenate([np.zeros(B.shape[1]), vols])
    A = sp.bmat([[M, B.T], [B, None]], format="csc")
    xref = spla.spsolve(A, b)
    return seqs, M, B, A, b, xref


def test_block_ldu_preconditioner(darcy_system):
    seqs, M, B, A, b, xref = darcy_system
    ldu = Block2x2LDU(M, B)
    it = [0]
    Pop = spla.LinearOperator(A.shape, matvec=ldu.apply)
    x, info = spla.gmres(A.tocsr(), b, M=Pop, rtol=1e-10, restart=50,
                         maxiter=200,
                         callback=lambda xx: it.__setitem__(0, it[0] + 1),
                         callback_type="x")
    assert np.abs(x - xref).max() < 1e-8
    assert it[0] <= 25


def test_bramble_pasciak_cg(darcy_system):
    seqs, M, B, A, b, xref = darcy_system
    bp = BramblePasciakCG(M, B)
    # gamma must make Mh < M
    d = M.diagonal()
    lam_min = spla.eigsh((sp.diags(1 / np.sqrt(d)) @ M @
                          sp.diags(1 / np.sqrt(d))).tocsc(),
                         k=1, sigma=0, which="LM",
                         return_eigenvectors=False)[0]
    assert bp.gamma < lam_min
    x = bp.solve(b, rtol=1e-8, maxiter=500)
    assert np.abs(x - xref).max() < 1e-6
    assert bp.iterations < 300


def test_mldivfree(darcy_system):
    seqs, M, B, A, b, xref = darcy_system
    ml = MLDivFree(seqs)
    nu = B.shape[1]
    u, p = ml.solve(np.zeros(nu), b[nu:])
    assert np.abs(u - xref[:nu]).max() < 1e-6
    # divergence constraint exact
    assert np.abs(B @ u - b[nu:]).max() < 1e-8
    assert np.abs(p - xref[nu:]).max() < 1e-5
