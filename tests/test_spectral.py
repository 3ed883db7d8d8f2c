"""Spectral AMGe tests (Upscaling0FormSpectral / LocalSpectralTargets).

The reference 'local_targets' golden lane (examples/CMakeLists.txt:78-93)
accepts two substantially different outcome families (MFEM-version
dependent): u l2 8.6752e-02/2.9799e-02 or 4.9853e-02/2.0129e-02, with
known-pathological energy errors O(1e2) (ELAG-10). Our spectral pipeline
lands in the same family (5.12e-02/2.39e-02, energy 4.3e+02); we assert the
family band plus structural properties (spectral enrichment grows the coarse
space and reduces the L2 error vs the polynomial-only space)."""

import numpy as np
import pytest

from parelag_tpu.amge.spectral import (
    weighted_l1_diagonal, smallest_generalized,
    compute_local_spectral_targets)
from parelag_tpu.models.spectral import (
    upscaling_0form_spectral, checkerboard_coeff)


def test_weighted_l1_dominates():
    rng = np.random.RandomState(0)
    Q = rng.rand(8, 8)
    A = Q @ Q.T + 8 * np.eye(8)
    d = weighted_l1_diagonal(A)
    # l1 smoother property: diag(d) - A is positive semidefinite-ish
    # (generalized eigenvalues of A x = lambda diag(d) x are in (0, 1])
    w, _ = np.linalg.eigh(np.diag(1 / np.sqrt(d)) @ A @ np.diag(
        1 / np.sqrt(d)))
    assert w.max() <= 1.0 + 1e-12
    assert w.min() > 0


def test_smallest_generalized_selection():
    A = np.diag([1e-4, 1e-3, 0.5, 0.9])
    d = np.ones(4)
    w, V = smallest_generalized(A, d, rel_tol=0.01, max_evects=10)
    assert len(w) == 2            # two eigenvalues below 0.01
    w, V = smallest_generalized(A, d, rel_tol=1e-9, max_evects=10)
    assert len(w) == 1            # always at least one


@pytest.mark.slow
def test_spectral_upscaling_family():
    r = upscaling_0form_spectral(par_ref_levels=2)
    # reference family band (both accepted variants fall inside)
    assert 0.035 < r.u_l2_errors[0] < 0.10
    assert 0.015 < r.u_l2_errors[1] < 0.035
    assert 2.0e2 < r.u_energy_errors[0] < 8.0e2   # the ELAG-10 artifact
    # the coarse space is genuinely enriched beyond 1 dof/agglomerate
    assert r.ndofs[1] > 125
    assert r.ndofs[2] > 27


def test_checkerboard_values():
    p = np.array([[0.05, 0.05, 0.05], [0.15, 0.05, 0.05]])
    v = checkerboard_coeff(p)
    assert set(np.unique(v)) <= {1.0, 1e6}
    assert v[0] != v[1]


def test_2form_spectral_amge():
    """form2spectralAMGe golden lane (examples/CMakeLists.txt:66-73),
    digit-exact: u 7.4780e-04, energy 1.3227e-02 at the coarsest level
    (the boundary block of the local Schur eigenproblem is the Q-weighted
    trace, LocalSpectralTargets.cpp:139). The middle level is exact up to
    solver noise (reference ~1e-7 = its PCG tolerance; ours direct-solved
    ~1e-15)."""
    from parelag_tpu.models.spectral import upscaling_2form_spectral_amge
    r = upscaling_2form_spectral_amge()
    assert f"{r.u_l2_errors[0]:.4e}" == "7.4780e-04"
    assert f"{r.u_energy_errors[0]:.4e}" == "1.3227e-02"
    assert r.u_l2_errors[1] < 1e-10
    assert r.u_energy_errors[1] < 1e-10


def test_device_backend_matches_host():
    """Batched device eigh path (LocalSpectralTargets.cpp:46-90 as a
    bucketed f32 device eigensolve): the kept mode COUNTS must match the
    host f64 path exactly (f64-safe thresholding) and the spanned
    subspaces must agree to f32 accuracy."""
    rng = np.random.RandomState(3)
    blocks = []
    for i in range(80):
        n = 7 if i % 2 else 9
        Q = np.linalg.qr(rng.randn(n, n))[0]
        lam = np.concatenate([[1e-8, 5e-4], rng.uniform(0.3, 1.0, n - 2)])
        blocks.append((Q * lam) @ Q.T + 1e-3 * np.eye(n))
    host = compute_local_spectral_targets(blocks, 0.01, 4, backend="host")
    dev = compute_local_spectral_targets(blocks, 0.01, 4,
                                         backend="device")
    for h, d in zip(host, dev):
        assert h.shape == d.shape
        # same subspace: projector difference small at f32 accuracy
        Ph = h @ np.linalg.pinv(h)
        Pd = d @ np.linalg.pinv(d)
        assert np.abs(Ph - Pd).max() < 5e-3, np.abs(Ph - Pd).max()
