"""Sequence API surface closing the round-3 gaps (verdict r3 #9):
ComputeLumpedMassOperator / the elemMatrixScaling ComputeMassOperator
overload (DeRhamSequence.hpp:390-396, DeRhamSequence.cpp:1285-1430,
bilinIntegrators.hpp:211-260) and ComputeSpaceInterpolationError
(DeRhamSequence.cpp:972-1062)."""

import numpy as np
import pytest
import scipy.sparse as sp

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import cartesian_partition


@pytest.fixture(scope="module")
def seqs():
    mesh = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(mesh)
    topo.coarsen_local_partitioning(
        cartesian_partition((4, 4, 4), (2, 2, 2)))
    seq = DeRhamSequenceFE(topo, mesh)
    seq.set_upscaling_targets(0)
    return seq, seq.coarsen()


def test_lumped_mass_spectrally_safe(seqs):
    """The reference's lumping (lambda_min(D^-1/2 M D^-1/2) * diag)
    guarantees x^T L x <= x^T M x and positive diagonal."""
    seq, _ = seqs
    rng = np.random.RandomState(0)
    for jform in range(4):
        L = seq.compute_lumped_mass_operator(jform)
        M = seq.compute_mass_operator(jform)
        d = L.diagonal()
        assert L.nnz == (d != 0).sum() and (d > 0).all(), jform
        for _ in range(5):
            x = rng.randn(M.shape[0])
            assert x @ (L @ x) <= x @ (M @ x) * (1 + 1e-12), jform


def test_lumped_top_form_is_mass(seqs):
    seq, _ = seqs
    L = seq.compute_lumped_mass_operator(3)
    M = seq.compute_mass_operator(3)
    assert abs(L - M).max() < 1e-14


def test_scaled_mass_operator(seqs):
    """elemMatrixScaling scales each element's block before assembly
    (ComputeMassOperator overload, DeRhamSequence.cpp:1326-1371)."""
    seq, _ = seqs
    ne = seq.topo.B[0].shape[0]
    s = 1.0 + np.arange(ne) / ne
    M1 = seq.compute_mass_operator(3, elem_scaling=s)
    M0 = seq.compute_mass_operator(3)
    assert abs(M1 - sp.diags(s) @ M0).max() < 1e-14
    # a constant scaling equals a scalar multiple for every form
    for jform in range(4):
        Ms = seq.compute_mass_operator(jform,
                                       elem_scaling=np.full(ne, 2.0))
        M = seq.compute_mass_operator(jform)
        assert abs(Ms - 2.0 * M).max() < 1e-12, jform
    # lumped variant scales linearly too
    L2 = seq.compute_lumped_mass_operator(0, np.full(ne, 2.0))
    L1 = seq.compute_lumped_mass_operator(0)
    assert abs(L2 - 2.0 * L1).max() < 1e-12


def test_space_interpolation_error(seqs):
    seq, coarse = seqs
    rng = np.random.RandomState(1)
    for jform in (0, 2):
        n = seq.dof[jform].ndofs
        # a vector already in the coarse space interpolates exactly
        w = rng.randn(coarse.dof[jform].ndofs)
        v_in = seq.P[jform] @ w
        out = coarse.compute_space_interpolation_error(jform, v_in)
        assert out["l2_rel"].shape == (1,)
        assert out["l2_rel"][0] < 1e-10, (jform, out)
        # a random fine vector has a nontrivial error in (0, 1]
        v = rng.randn(n)
        out = coarse.compute_space_interpolation_error(jform, v)
        assert 0.0 < out["l2_rel"][0] <= 1.5
        if jform < 3:
            assert np.isfinite(out["energy_rel"]).all()
    # multivector input: per-column errors
    V = rng.randn(seq.dof[0].ndofs, 3)
    out = coarse.compute_space_interpolation_error(0, V)
    assert out["l2_rel"].shape == (3,)


def test_interpolation_error_matches_inline(seqs):
    """The API equals the inline P @ (Pi @ v) computation the reference
    performs (DeRhamSequence.cpp:1010-1046), including the energy
    variant's D-term."""
    seq, coarse = seqs
    rng = np.random.RandomState(2)
    jform = 0
    v = rng.randn(seq.dof[jform].ndofs)
    out = coarse.compute_space_interpolation_error(jform, v)
    Pi = sp.csr_matrix(seq.Pi[jform].matrix)
    P = sp.csr_matrix(seq.P[jform])
    diff = P @ (Pi @ v) - v
    M = seq.compute_mass_operator(jform)
    W = seq.compute_mass_operator(jform + 1)
    l2d = diff @ (M @ diff)
    l2v = v @ (M @ v)
    assert abs(out["l2_rel"][0] - np.sqrt(l2d / l2v)) < 1e-12
    dd = seq.D[jform] @ diff
    dv = seq.D[jform] @ v
    en = np.sqrt((l2d + dd @ (W @ dd)) / (l2v + dv @ (W @ dv)))
    assert abs(out["energy_rel"][0] - en) < 1e-12
