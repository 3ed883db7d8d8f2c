"""Weak-scaling driver tests (3DH{div,curl}WeakScaling analogs): level-wise
upscaling error decay and consistency with the golden UpscalingGeneralForm
values on the shared middle-level geometry."""

import pytest

from parelag_tpu.models.weak_scaling import weak_scaling_driver


@pytest.mark.parametrize("form,mid_l2,mid_en", [
    (2, "9.1847e-03", "1.2515e-01"),
    (1, "3.1436e-02", "3.2016e-01"),
])
def test_weak_scaling_three_levels_straight(form, mid_l2, mid_en):
    """Undeformed cube with all-form targets: the middle level is
    geometrically identical to the 2-level golden UpscalingGeneralForm
    configuration and must reproduce its digits."""
    r = weak_scaling_driver(form, nref_parallel=2, deform=False,
                            targets_form_start=0)
    assert r.u_l2_errors[0] > r.u_l2_errors[1]
    assert r.u_energy_errors[0] > r.u_energy_errors[1]
    assert f"{r.u_l2_errors[1]:.4e}" == mid_l2
    assert f"{r.u_energy_errors[1]:.4e}" == mid_en


@pytest.mark.parametrize("form,gold_l2,gold_en,rtol", [
    # Hdiv: digit-exact vs examples/CMakeLists.txt:131-136
    (2, (3.4325e-01, 1.2642e-01), (2.9404e-01, 1.3420e-01), 5e-5),
    # Hcurl: reference evaluates errors on ADS-iterative solutions at
    # rtol 1e-6 (we solve direct) — match to ~1e-4 relative
    # (examples/CMakeLists.txt:139-144; see weak_scaling.py docstring)
    (1, (1.6197e-01, 3.0947e-02), (7.0872e-01, 2.3455e-01), 3e-4),
])
def test_weak_scaling_reference_goldens(form, gold_l2, gold_en, rtol):
    """The reference CTest configuration exactly: deformed mesh +
    form_start=2 targets (round-2 VERDICT item 8)."""
    r = weak_scaling_driver(form, nref_parallel=2)
    for got, want in zip(r.u_l2_errors, gold_l2):
        assert abs(got - want) <= rtol * want, (got, want)
    for got, want in zip(r.u_energy_errors, gold_en):
        assert abs(got - want) <= rtol * want, (got, want)


def test_distributed_weak_scaling():
    """Weak scaling through the multi-level distributed pipeline: dofs
    grow with ranks, the sharded V-cycle PCG converges at every size."""
    from parelag_tpu.models.weak_scaling import distributed_weak_scaling
    res = distributed_weak_scaling(n_ranks_list=(1, 2, 4))
    assert [r["n_ranks"] for r in res] == [1, 2, 4]
    assert res[0]["ndofs"] < res[1]["ndofs"] < res[2]["ndofs"]
    for r in res:
        assert r["levels"] == 3
        assert r["rel_res"] < 1e-8, r
