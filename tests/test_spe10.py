"""SPE10 heterogeneous Darcy tests (MultigridTestSPE10 /
InversePermeabilityFunction equivalents). The official spe_perm.dat is an
external download; tests run on the statistically similar synthetic field
and the reader is unit-tested against a small synthetic file in the same
format."""

import numpy as np
import pytest

from parelag_tpu.models.spe10 import (
    read_spe10_permeability, synthetic_spe10_field, spe10_darcy)


def test_reader_format(tmp_path):
    nx, ny, nz = 3, 2, 2
    rng = np.random.RandomState(0)
    k = rng.rand(3, nz, ny, nx) + 0.5
    f = tmp_path / "spe_perm.dat"
    f.write_text(" ".join(f"{x:.6e}" for x in k.ravel()))
    field = read_spe10_permeability(str(f), cells=(nx, ny, nz),
                                    sizes=(20.0, 10.0, 2.0))
    # cell (i,j,k), component c: inverse of input
    assert field.inv_perm[1, 0, 1, 2] == pytest.approx(
        1.0 / k[2, 1, 0, 1])
    # lookup at the cell center
    p = np.array([[30.0, 5.0, 3.0]])     # cell (1, 0, 1)
    v = field.inverse_permeability(p)
    assert v[0, 2] == pytest.approx(1.0 / k[2, 1, 0, 1])


def test_slice():
    f = synthetic_spe10_field(cells=(4, 4, 4))
    s = f.slice_2d(2)
    assert s.cells == (4, 4, 1)
    assert np.allclose(s.inv_perm[..., 0, :], f.inv_perm[..., 2, :])


def test_spe10_darcy_spectral_beats_polynomial():
    r_poly = spe10_darcy(cells=(8, 8, 4), n_levels=2, solver="direct")
    r_spec = spe10_darcy(cells=(8, 8, 4), n_levels=2, spectral=True,
                         solver="direct")
    assert r_spec["u_l2_rel"] < 0.15
    assert r_spec["u_l2_rel"] < 0.5 * r_poly["u_l2_rel"]


def test_spe10_hybridized_matches_direct():
    r1 = spe10_darcy(cells=(8, 8, 4), n_levels=2, solver="hybridization")
    r2 = spe10_darcy(cells=(8, 8, 4), n_levels=2, solver="direct")
    scale = np.abs(r2["u"][0]).max()
    assert np.abs(r1["u"][0] - r2["u"][0]).max() < 1e-7 * scale
    assert r1["u_l2_rel"] == pytest.approx(r2["u_l2_rel"], rel=1e-5)


def test_sample_generator():
    """HdivL2SampleGenerator analog: distinct random coefficient samples,
    each solved consistently fine/coarse with modest upscaling error."""
    from parelag_tpu.models.samplegen import HdivL2SampleGenerator
    gen = HdivL2SampleGenerator(nref=1, seed=3)
    s1 = gen.sample()
    s2 = gen.sample()
    assert not np.allclose(s1["kinv"], s2["kinv"])
    for s in (s1, s2):
        # PV-only coarse Hdiv space under a rough random coefficient:
        # bounded but sizeable upscaling error (spectral enrichment is the
        # cure, cf. test_spe10_darcy_spectral_beats_polynomial)
        assert 0 < s["u_l2_rel_err"] < 0.9
