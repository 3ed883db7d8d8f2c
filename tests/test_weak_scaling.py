"""Weak-scaling driver tests (3DH{div,curl}WeakScaling analogs): level-wise
upscaling error decay and consistency with the golden UpscalingGeneralForm
values on the shared middle-level geometry."""

import pytest

from parelag_tpu.models.weak_scaling import weak_scaling_driver


@pytest.mark.parametrize("form,mid_l2,mid_en", [
    (2, "9.1847e-03", "1.2515e-01"),
    (1, "3.1436e-02", "3.2016e-01"),
])
def test_weak_scaling_three_levels(form, mid_l2, mid_en):
    r = weak_scaling_driver(form, nref_parallel=2)
    # errors decay with level
    assert r.u_l2_errors[0] > r.u_l2_errors[1]
    assert r.u_energy_errors[0] > r.u_energy_errors[1]
    # the middle level is geometrically identical to the 2-level golden
    # UpscalingGeneralForm configuration and must reproduce its digits
    assert f"{r.u_l2_errors[1]:.4e}" == mid_l2
    assert f"{r.u_energy_errors[1]:.4e}" == mid_en


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
