"""Golden-value acceptance tests.

These reproduce the reference's CTest PASS_REGULAR_EXPRESSION values
(testsuite/CMakeLists.txt:114-178) — the de facto accuracy baseline of
LLNL/parelag (see BASELINE.md). The runs are UpscalingGeneralForm.exe
--form {0,1,2} --nref_parallel 1 on the generated 2x2x2 hex cube with
derefinement coarsening; values asserted to the 4 printed digits.
"""

import pytest

from parelag_tpu.models.upscaling import upscaling_general_form


def _fmt(x):
    return f"{x:.4e}"


@pytest.mark.parametrize("form,l2,energy", [
    (0, "1.8389e-02", "2.1485e-01"),
    (1, "3.1436e-02", "3.2016e-01"),
    (2, "9.1847e-03", "1.2515e-01"),
])
def test_golden_form(form, l2, energy):
    r = upscaling_general_form(form, nref_parallel=1)
    assert _fmt(r.u_l2_errors[0]) == l2
    assert _fmt(r.u_energy_errors[0]) == energy


def test_geometric_partitioner_form1():
    """geometric_form1 (testsuite/CMakeLists.txt:190-195): the geometric box
    partitioner reproduces the structured coarsening on this mesh."""
    r = upscaling_general_form(1, nref_parallel=1, geometric=True)
    assert _fmt(r.u_l2_errors[0]) == "3.1436e-02"
    assert _fmt(r.u_energy_errors[0]) == "3.2016e-01"


def test_unstructured_form1():
    """unstructured_form1 analog (testsuite/CMakeLists.txt:181-187): the
    reference's golden values are METIS-partition-dependent (it accepts two
    alternates); our graph partitioner produces different agglomerates, so we
    assert the upscaling quality band rather than exact digits."""
    r = upscaling_general_form(1, nref_parallel=1, unstructured=True)
    assert r.u_l2_errors[0] < 0.12
    assert r.u_energy_errors[0] < 0.6


def test_golden_form2_amge():
    """form2AMGe (examples/CMakeLists.txt:51-63): 3-level Hdiv upscaling,
    body force (0,0,1), no-flow boundary."""
    from parelag_tpu.models.upscaling import upscaling_2form_amge
    r = upscaling_2form_amge()
    assert [_fmt(x) for x in r.u_l2_errors] == ["1.9010e-02", "3.9570e-03"]
    assert [_fmt(x) for x in r.u_energy_errors] == [
        "1.2883e-01", "5.7793e-02"]
