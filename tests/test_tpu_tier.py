"""Real-TPU test tier (VERDICT r3 #4): the chip-facing surfaces that
round 3 shipped untested — the structured setup engine (which silently
failed on hardware at every flagship size while passing the CPU-x64
suite), the Pallas DIA kernel, the Newton-Schulz batched device solves,
and the device eigh — each exercised ON the real accelerator.

The suite's conftest forces the CPU platform in-process, so every test
here runs jax in a SUBPROCESS with a clean environment (same pattern as
test_tpu_device.py); all skip when no accelerator is reachable.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    return env


def _run(script, timeout=1500):
    return subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True,
                          env=_clean_env(), timeout=timeout)


def _check(r, *tags):
    assert r.returncode == 0, \
        f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    for tag in tags:
        assert tag in r.stdout, r.stdout


_HAVE = None


def _have_tpu():
    global _HAVE
    if _HAVE is None:
        try:
            r = _run("import jax; print(jax.default_backend())",
                     timeout=240)
            _HAVE = r.returncode == 0 and r.stdout.strip() not in (
                "", "cpu")
        except Exception:
            _HAVE = False
    return _HAVE


needs_tpu = pytest.mark.skipif("not _have_tpu()",
                               reason="no accelerator backend")


_PREAMBLE = r"""
import numpy as np
import jax
import jax.numpy as jnp
assert jax.default_backend() != "cpu", jax.devices()
from parelag_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
"""


# ------------------------------------------------------------------ #
# 1. precision canary: the round-3 root cause
# ------------------------------------------------------------------ #

@needs_tpu
def test_matmul_precision_canary():
    """The structured engine traces under matmul precision 'float32'
    because this chip's DEFAULT f32 matmul is bf16-pass (~1e-3 rel err,
    the round-3 guard-trip root cause).  Assert the engine's contract:
    f32-precision matmuls reach ~1e-7 on hardware."""
    r = _run(_PREAMBLE + r"""
rng = np.random.RandomState(0)
A = rng.randn(64, 33, 33).astype(np.float32)
Aj = jnp.asarray(A)
ref = np.einsum('nij,njk->nik', A.astype(np.float64),
                A.astype(np.float64))
with jax.default_matmul_precision("float32"):
    C = np.asarray(jax.jit(lambda a: a @ a)(Aj), dtype=np.float64)
err = np.abs(C - ref).max() / np.abs(ref).max()
assert err < 1e-6, err
print("precision ok", err)
""")
    _check(r, "precision ok")


# ------------------------------------------------------------------ #
# 2-5. structured engine on hardware
# ------------------------------------------------------------------ #

@needs_tpu
def test_structured_ns_chain_32():
    """The exact round-3 failure case: the full-de-Rham structured
    chain at 32^3 in ns mode must pass its static-structure guards on
    the chip (it guard-tripped at 2.2e-3 before the precision fix)."""
    r = _run(_PREAMBLE + r"""
from parelag_tpu.amge import structured as stc
lvl0 = stc.fine_level((32, 32, 32), dtype=np.float32)
with stc.solve_mode("ns"):
    levels, outs = stc.coarsen_chain(lvl0, 3, jform_start=0)
stc.force_outputs(*levels, *outs)
for o in outs:
    assert o.bub_sv < 2e-4, o.bub_sv
    assert o.max_rel_sv < 1e-6, o.max_rel_sv
    assert o.ns_res < 1e-4, o.ns_res
print("chain32 ok", [o.bub_sv for o in outs])
""")
    _check(r, "chain32 ok")


@needs_tpu
def test_structured_chunked_parity_on_device():
    """The HBM-bounded chunked driver matches the whole-level program
    on the chip (ns mode, f32): same kernels, different tiling."""
    r = _run(_PREAMBLE + r"""
from parelag_tpu.amge import structured as stc
lvl0 = stc.fine_level((16, 16, 16), dtype=np.float32)
with stc.solve_mode("ns"):
    cw, outw = stc.coarsen_structured(lvl0, jform_start=0, chunk=0)
    cc, outc = stc.coarsen_structured(lvl0, jform_start=0, chunk=100)
for f in ("ptr3", "ptr2", "pint2", "d2c", "pf1", "pc1", "d1c",
          "pe0", "pf0", "pc0", "d0c"):
    a = np.asarray(getattr(outw, f), dtype=np.float64)
    b = np.asarray(getattr(outc, f), dtype=np.float64)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
    assert rel < 5e-5, (f, rel)
print("chunked ok")
""")
    _check(r, "chunked ok")


@needs_tpu
def test_structured_invariants_on_device():
    """Galerkin (M_c = P^T M_f P) and commutation (D_f P_j = P_{j+1}
    D_c) on the chip-built chain — the reference's CheckInvariants
    surface (DeRhamSequence.cpp:694-970) at f32 tolerance."""
    r = _run(_PREAMBLE + r"""
import scipy.sparse as sp
from parelag_tpu.amge import structured as stc
lvl0 = stc.fine_level((16, 16, 16), dtype=np.float32)
with stc.solve_mode("ns"):
    levels, outs = stc.coarsen_chain(lvl0, 2, jform_start=0)
lvl, out, coarse = levels[0], outs[0], levels[1]
for j in range(4):
    P = stc.materialize_P(out, lvl.shape, j).astype(np.float64)
    Mc = (P.T @ stc.global_mass(lvl, j).astype(np.float64) @ P).tocsr()
    Mg = stc.global_mass(coarse, j).astype(np.float64)
    d = abs(Mc - Mg).max() / max(abs(Mg).max(), 1e-30)
    assert d < 5e-5, (j, d)
for j in range(3):
    Pj = stc.materialize_P(out, lvl.shape, j).astype(np.float64)
    Pj1 = stc.materialize_P(out, lvl.shape, j + 1).astype(np.float64)
    lhs = (stc.global_derivative(lvl, j).astype(np.float64) @ Pj)
    rhs = (Pj1 @ stc.global_derivative(coarse, j).astype(np.float64))
    d = abs(lhs - rhs).max() / max(abs(lhs).max(), 1e-30)
    assert d < 5e-5, (j, d)
print("invariants ok")
""")
    _check(r, "invariants ok")


@needs_tpu
def test_structured_darcy_on_device():
    """The Hdiv-L2 production path (coarsen_darcy, the SPE10 chain) in
    ns mode on the chip: guards pass, coarse div rows stay the exact
    6-col stencil (zero-snap calibrated for ns noise, advisor r3)."""
    r = _run(_PREAMBLE + r"""
from parelag_tpu.amge import structured as stc
lvl0 = stc.fine_level((16, 16, 16), dtype=np.float32)
with stc.solve_mode("ns"):
    coarse, out = stc.coarsen_darcy(lvl0)
d2c = np.asarray(out.d2c, dtype=np.float64)
assert np.isfinite(d2c).all()
# every coarse cell keeps the +-1/vol 6-face stencil: no entry is
# ns-noise-small but nonzero
mags = np.abs(d2c) / np.abs(d2c).max(axis=1, keepdims=True)
assert ((mags == 0) | (mags > 1e-3)).all()
assert out.ns_res < 1e-4, out.ns_res
print("darcy ok", out.bub_sv, out.ns_res)
""")
    _check(r, "darcy ok")


# ------------------------------------------------------------------ #
# 6. Pallas DIA kernel on hardware
# ------------------------------------------------------------------ #

@needs_tpu
def test_pallas_dia_spmv_on_device():
    r = _run(_PREAMBLE + r"""
import scipy.sparse as sp
from parelag_tpu.ops.device_sparse import to_dia, DiaMatrix
n = 17 ** 3
main = 6.0 + np.arange(n) % 3
A = sp.diags([main, -1.0 * np.ones(n - 1), -1.0 * np.ones(n - 1),
              -0.5 * np.ones(n - 17), -0.5 * np.ones(n - 17)],
             [0, 1, -1, 17, -17]).tocsr().astype(np.float32)
Ad = to_dia(A, dtype=np.float32)
assert isinstance(Ad, DiaMatrix), type(Ad)
# engagement, not just values (round-4 verdict weak #2): this test must
# fail if the Pallas lowering regresses and the XLA fallback takes over
from parelag_tpu.ops.pallas_kernels import pallas_dia_supported
assert pallas_dia_supported(), "Pallas DIA kernel does not lower on chip"
assert Ad._pallas_ok(), "DIA matvec will not take the Pallas path"
x = np.random.RandomState(0).randn(n).astype(np.float32)
y = np.asarray(jax.jit(lambda v: Ad @ v)(jnp.asarray(x)))
ref = A @ x
assert np.abs(y - ref).max() < 5e-5 * np.abs(ref).max()
print("dia ok")
""")
    _check(r, "dia ok")


@needs_tpu
def test_fused_jacobi_sweep_on_device():
    """The fused DIA Jacobi sweep kernel (one dispatch per sweep) ==
    the unfused x + d*(b - A@x) on the chip."""
    r = _run(_PREAMBLE + r"""
import scipy.sparse as sp
from parelag_tpu.ops.device_sparse import to_dia
from parelag_tpu.solvers.smoothers import L1JacobiSmoother
n = 17 ** 3
A = sp.diags([6.0 + np.arange(n) % 3, -np.ones(n - 1), -np.ones(n - 1),
              -0.5 * np.ones(n - 17), -0.5 * np.ones(n - 17)],
             [0, 1, -1, 17, -17]).tocsr().astype(np.float32)
Ad = to_dia(A, dtype=np.float32)
dinv = (1.0 / np.asarray(np.abs(A).sum(axis=1)).ravel()
        ).astype(np.float32)
smo = L1JacobiSmoother(jnp.asarray(dinv), sweeps=2, omega=1.0)
rng = np.random.RandomState(0)
b = rng.randn(n).astype(np.float32)
x0 = rng.randn(n).astype(np.float32)
fused = smo._fused(Ad, jnp.asarray(b), jnp.asarray(x0), 2)
assert fused is not None, "fused path did not engage on the chip"
out = np.asarray(fused, dtype=np.float64)
x = x0.astype(np.float64)
for _ in range(2):
    x = x + dinv.astype(np.float64) * (b - A.astype(np.float64) @ x)
rel = np.abs(out - x).max() / np.abs(x).max()
assert rel < 1e-5, rel
print("fused ok", rel)
""")
    _check(r, "fused ok")


@needs_tpu
def test_pallas_dia_multirhs_on_device():
    """The multi-RHS DIA kernel (round-5 verdict #10: 2-RHS cycles cost
    6.2x the 1-RHS cycle on the XLA fallback) engages AND matches scipy
    on hardware — engagement asserted like the 1-RHS lanes."""
    r = _run(_PREAMBLE + r"""
import scipy.sparse as sp
from parelag_tpu.ops.device_sparse import to_dia
from parelag_tpu.ops.pallas_kernels import pallas_dia_multirhs_supported
n, s = 17 ** 3, 4
A = sp.diags([6.0 + np.arange(n) % 3, -np.ones(n - 1), -np.ones(n - 1),
              -0.5 * np.ones(n - 17), -0.5 * np.ones(n - 17)],
             [0, 1, -1, 17, -17]).tocsr().astype(np.float32)
Ad = to_dia(A, dtype=np.float32)
assert pallas_dia_multirhs_supported(), \
    "multi-RHS Pallas DIA kernel does not lower on chip"
assert Ad._pallas_multirhs_ok(s), \
    "multi-RHS matvec will not take the Pallas path"
rng = np.random.RandomState(0)
X = rng.randn(n, s).astype(np.float32)
y = np.asarray(jax.jit(lambda v: Ad @ v)(jnp.asarray(X)))
ref = A @ X
assert np.abs(y - ref).max() < 5e-5 * np.abs(ref).max()
# fused multi-RHS Jacobi sweep engages through the smoother gate
from parelag_tpu.solvers.smoothers import L1JacobiSmoother
dinv = (1.0 / np.asarray(np.abs(A).sum(axis=1)).ravel()
        ).astype(np.float32)
smo = L1JacobiSmoother(jnp.asarray(dinv), sweeps=2, omega=1.0)
b = rng.randn(n, s).astype(np.float32)
x0 = rng.randn(n, s).astype(np.float32)
fused = smo._fused(Ad, jnp.asarray(b), jnp.asarray(x0), 2)
assert fused is not None, "fused multi-RHS path did not engage"
out = np.asarray(fused, dtype=np.float64)
x = x0.astype(np.float64)
A64 = A.astype(np.float64)
for _ in range(2):
    x = x + dinv.astype(np.float64)[:, None] * (b - A64 @ x)
rel = np.abs(out - x).max() / np.abs(x).max()
assert rel < 1e-5, rel
print("multirhs ok", rel)
""")
    _check(r, "multirhs ok")


# ------------------------------------------------------------------ #
# 7. Newton-Schulz batched device solve on hardware
# ------------------------------------------------------------------ #

@needs_tpu
def test_ns_batched_solve_on_device():
    r = _run(_PREAMBLE + r"""
from parelag_tpu.ops.batched import _device_solve_refined
rng = np.random.RandomState(0)
n = 24
Q, _ = np.linalg.qr(rng.randn(n, n))
A = np.stack([(Q * np.logspace(0, -6, n)) @ Q.T for _ in range(16)])
B = rng.randn(16, n, 4)
X = _device_solve_refined(A, B)
r_max = np.abs(np.einsum('nij,njk->nik', A, X) - B).max()
assert r_max < 1e-8, r_max
print("ns ok", r_max)
""")
    _check(r, "ns ok")


# ------------------------------------------------------------------ #
# 7b. heterogeneous spectral Hdiv-L2 engine on hardware (round-5 #4:
#     the SPE10 north-star path had zero chip coverage)
# ------------------------------------------------------------------ #

@needs_tpu
def test_structured_spectral_dims_on_device():
    """spectral_coarsen_darcy at the (30,55,21) north-star class grid
    runs ON THE CHIP (ns mode, f32) with every convergence guard green,
    and its coarse dimensions track the host direct-mode engine (same
    f32 dtype isolates the solve strategy; marginal keep-threshold
    flips across backends are tolerated to 1%)."""
    import numpy as np
    from parelag_tpu.amge import structured_spectral as sps
    from parelag_tpu.models.spe10 import synthetic_spe10_field

    cells, f = (30, 55, 21), (3, 5, 3)
    field = synthetic_spe10_field(cells, seed=0)
    coeff = field.inv_perm.mean(-1).transpose(2, 1, 0).ravel()
    # host reference: direct f32 (in-process; conftest pins CPU)
    out_h = sps.spectral_coarsen_darcy(
        cells, f, coeff.astype(np.float32), h=field.sizes,
        spect_tol=0.002, max_evects=5, dtype=np.float32)

    r = _run(_PREAMBLE + r"""
import numpy as np
from parelag_tpu.amge import structured as stc
from parelag_tpu.amge import structured_spectral as sps
from parelag_tpu.models.spe10 import synthetic_spe10_field
cells, f = (30, 55, 21), (3, 5, 3)
field = synthetic_spe10_field(cells, seed=0)
coeff = field.inv_perm.mean(-1).transpose(2, 1, 0).ravel()
import time; t0 = time.time()
with stc.solve_mode("ns"):
    out = sps.spectral_coarsen_darcy(
        cells, f, coeff.astype(np.float32), h=field.sizes,
        spect_tol=0.002, max_evects=5, dtype=np.float32)
print("sps_dims", out.P2.shape[1], out.P3.shape[1],
      float(out.ns_res), round(time.time() - t0, 1))
""", timeout=2400)
    _check(r, "sps_dims")
    toks = r.stdout.split("sps_dims", 1)[1].split()
    nu_c, np_c, ns_res = int(toks[0]), int(toks[1]), float(toks[2])
    assert ns_res < 5e-4, ns_res
    assert abs(nu_c - out_h.P2.shape[1]) <= 0.01 * out_h.P2.shape[1], \
        (nu_c, out_h.P2.shape[1])
    assert abs(np_c - out_h.P3.shape[1]) <= 0.01 * out_h.P3.shape[1], \
        (np_c, out_h.P3.shape[1])


@needs_tpu
def test_structured_spectral_quality_on_device(tmp_path):
    """Chip-built coarse spaces (ns, f32) reproduce the host engine's
    Darcy upscaling error at a sub-20k SPE10-class grid — the same
    quality sentinel the parity oracle pins on CPU
    (tests/test_structured_spectral.py)."""
    import numpy as np
    import scipy.sparse as sp_
    import scipy.sparse.linalg as spla
    from parelag_tpu.amge import structured as st
    from parelag_tpu.amge import structured_spectral as sps
    from parelag_tpu.models.spe10 import synthetic_spe10_field

    cells, f = (12, 20, 10), (3, 4, 2)
    field = synthetic_spe10_field(cells, seed=0)
    coeff = field.inv_perm.mean(-1).transpose(2, 1, 0).ravel()
    h = field.sizes
    out_npz = tmp_path / "sps_chip.npz"

    r = _run(_PREAMBLE + rf"""
import numpy as np
import scipy.sparse as sp
from parelag_tpu.amge import structured as stc
from parelag_tpu.amge import structured_spectral as sps
from parelag_tpu.models.spe10 import synthetic_spe10_field
cells, f = (12, 20, 10), (3, 4, 2)
field = synthetic_spe10_field(cells, seed=0)
coeff = field.inv_perm.mean(-1).transpose(2, 1, 0).ravel()
with stc.solve_mode("ns"):
    out = sps.spectral_coarsen_darcy(
        cells, f, coeff.astype(np.float32), h=field.sizes,
        spect_tol=0.002, max_evects=5, dtype=np.float32)
P2, P3 = out.P2.tocoo(), out.P3.tocoo()
np.savez(r"{out_npz}",
         p2_row=P2.row, p2_col=P2.col, p2_val=P2.data,
         p2_shape=P2.shape, p3_row=P3.row, p3_col=P3.col,
         p3_val=P3.data, p3_shape=P3.shape, ns_res=out.ns_res)
print("sps_quality_saved", float(out.ns_res))
""", timeout=2400)
    _check(r, "sps_quality_saved")

    z = np.load(out_npz)
    P2c = sp_.coo_matrix((z["p2_val"], (z["p2_row"], z["p2_col"])),
                         shape=tuple(z["p2_shape"])).tocsr()
    P3c = sp_.coo_matrix((z["p3_val"], (z["p3_row"], z["p3_col"])),
                         shape=tuple(z["p3_shape"])).tocsr()

    # host reference spaces (f32 direct: the SAME dtype as the chip run
    # isolates the backend/solve strategy — the f32 keep-floor keeps
    # fewer modes than f64 by design, measured err 0.179 vs 0.122 here,
    # so an f64 reference would test the dtype, not the chip) + the
    # shared error functional
    out_h = sps.spectral_coarsen_darcy(cells, f, coeff.astype(np.float32),
                                       h=h, spect_tol=0.002,
                                       max_evects=5, dtype=np.float32)
    nc, nf, _, _ = st.grid_counts(cells)
    ref = st.fine_local_masses(h)
    M2 = st.assemble_global(
        np.asarray(coeff)[:, None, None] * ref[(0, 2)][None],
        st.cell_faces(cells), sum(nf))
    W = sp_.diags(np.full(nc, float(ref[(0, 3)][0, 0]))).tocsr()
    _, _, d2 = st.fine_derivative_values(cells, h)
    D2 = st.assemble_d_csr(d2, st.d2_cols(cells), (nc, sum(nf)))
    B = (W @ D2).tocsr()
    rhs = np.concatenate([np.zeros(sum(nf)), W.diagonal()])
    A = sp_.bmat([[M2, B.T], [B, None]], format="csc")
    x = spla.spsolve(A, rhs)
    uf = x[:sum(nf)]

    def upscale_err(P2, P3):
        Ac = sp_.bmat([[(P2.T @ M2 @ P2), (P3.T @ B @ P2).T],
                       [(P3.T @ B @ P2), None]], format="csc")
        xc = spla.spsolve(Ac, np.concatenate(
            [np.zeros(P2.shape[1]), P3.T @ W.diagonal()]))
        uc = P2 @ xc[:P2.shape[1]]
        du = uc - uf
        return float(np.sqrt(du @ (M2 @ du)) / np.sqrt(uf @ (M2 @ uf)))

    err_chip = upscale_err(P2c.astype(np.float64), P3c.astype(np.float64))
    err_host = upscale_err(out_h.P2.astype(np.float64),
                           out_h.P3.astype(np.float64))
    assert abs(err_chip - err_host) < 5e-4 + 1e-2 * err_host, \
        (err_chip, err_host)


@needs_tpu
def test_structured_spectral_ml_on_device(tmp_path):
    """The MULTILEVEL block spectral engine
    (amge/structured_spectral_ml.py) recursing ON THE CHIP: a 2-level
    chain in ns/f32 mode with every stage guard green, coarse dims
    tracking the host f32 direct chain, and the composed prolongation's
    Darcy upscaling error matching the host chain's (reference:
    recursive Coarsen() with per-level spectral targets,
    DeRhamSequence.cpp:572-692)."""
    import numpy as np
    import scipy.sparse as sp_
    import scipy.sparse.linalg as spla
    from parelag_tpu.amge import structured as st
    from parelag_tpu.amge import structured_spectral_ml as ml
    from parelag_tpu.models.spe10 import synthetic_spe10_field

    cells, facs = (12, 20, 8), ((3, 4, 2), (2, 5, 2))
    field = synthetic_spe10_field(cells, seed=0)
    coeff = field.inv_perm.mean(-1).transpose(2, 1, 0).ravel()
    h = field.sizes
    out_npz = tmp_path / "sps_ml_chip.npz"

    r = _run(_PREAMBLE + rf"""
import numpy as np
from parelag_tpu.amge import structured as stc
from parelag_tpu.amge import structured_spectral_ml as ml
from parelag_tpu.models.spe10 import synthetic_spe10_field
cells, facs = (12, 20, 8), ((3, 4, 2), (2, 5, 2))
field = synthetic_spe10_field(cells, seed=0)
coeff = field.inv_perm.mean(-1).transpose(2, 1, 0).ravel()
with stc.solve_mode("ns"):
    levels, outs = ml.spectral_coarsen_darcy_chain(
        cells, facs, coeff.astype(np.float32), h=field.sizes,
        spect_tol=0.002, max_evects=4, dtype=np.float32)
Pu = (outs[0].P2 @ outs[1].P2).tocoo()
Pp = (outs[0].P3 @ outs[1].P3).tocoo()
np.savez(r"{out_npz}",
         pu_row=Pu.row, pu_col=Pu.col, pu_val=Pu.data,
         pu_shape=Pu.shape, pp_row=Pp.row, pp_col=Pp.col,
         pp_val=Pp.data, pp_shape=Pp.shape,
         ns_res=max(o.ns_res for o in outs))
print("sps_ml_saved", max(float(o.ns_res) for o in outs))
""", timeout=2400)
    _check(r, "sps_ml_saved")

    z = np.load(out_npz)
    assert float(z["ns_res"]) < 5e-4, float(z["ns_res"])
    Puc = sp_.coo_matrix((z["pu_val"], (z["pu_row"], z["pu_col"])),
                         shape=tuple(z["pu_shape"])).tocsr()
    Ppc = sp_.coo_matrix((z["pp_val"], (z["pp_row"], z["pp_col"])),
                         shape=tuple(z["pp_shape"])).tocsr()

    # host f32 direct chain (same dtype isolates the backend; borderline
    # keep flips compound across levels, so dims get a 3% band and the
    # error the multilevel f32 band from test_structured_spectral_ml)
    with st.solve_mode("direct"):
        _, outs_h = ml.spectral_coarsen_darcy_chain(
            cells, facs, coeff.astype(np.float32), h=h,
            spect_tol=0.002, max_evects=4, dtype=np.float32)
    Puh = (outs_h[0].P2 @ outs_h[1].P2).astype(np.float64)
    Pph = (outs_h[0].P3 @ outs_h[1].P3).astype(np.float64)
    assert abs(Puc.shape[1] - Puh.shape[1]) <= max(
        3, 0.03 * Puh.shape[1]), (Puc.shape, Puh.shape)
    assert abs(Ppc.shape[1] - Pph.shape[1]) <= max(
        3, 0.03 * Pph.shape[1]), (Ppc.shape, Pph.shape)

    nc, nf, _, _ = st.grid_counts(cells)
    ref = st.fine_local_masses(h)
    M2 = st.assemble_global(
        np.asarray(coeff)[:, None, None] * ref[(0, 2)][None],
        st.cell_faces(cells), sum(nf))
    W = sp_.diags(np.full(nc, float(ref[(0, 3)][0, 0]))).tocsr()
    _, _, d2 = st.fine_derivative_values(cells, h)
    D2 = st.assemble_d_csr(d2, st.d2_cols(cells), (nc, sum(nf)))
    B = (W @ D2).tocsr()
    rhs = np.concatenate([np.zeros(sum(nf)), W.diagonal()])
    A = sp_.bmat([[M2, B.T], [B, None]], format="csc")
    x = spla.spsolve(A, rhs)
    uf = x[:sum(nf)]

    def upscale_err(P2, P3):
        Ac = sp_.bmat([[(P2.T @ M2 @ P2), (P3.T @ B @ P2).T],
                       [(P3.T @ B @ P2), None]], format="csc")
        xc = spla.spsolve(Ac, np.concatenate(
            [np.zeros(P2.shape[1]), P3.T @ W.diagonal()]))
        uc = P2 @ xc[:P2.shape[1]]
        du = uc - uf
        return float(np.sqrt(du @ (M2 @ du)) / np.sqrt(uf @ (M2 @ uf)))

    err_chip = upscale_err(Puc.astype(np.float64), Ppc.astype(np.float64))
    err_host = upscale_err(Puh, Pph)
    assert abs(err_chip - err_host) < 5e-3 + 1.5e-1 * err_host, \
        (err_chip, err_host)


# ------------------------------------------------------------------ #
# 8. device eigh (spectral targets) on hardware
# ------------------------------------------------------------------ #

@needs_tpu
def test_device_eigh_on_device():
    r = _run(_PREAMBLE + r"""
from parelag_tpu.amge.spectral import _device_eigh_batch
rng = np.random.RandomState(1)
A = rng.randn(8, 20, 20)
A = (A + A.transpose(0, 2, 1)) / 2
w_d, V_d = (np.asarray(x, dtype=np.float64)
            for x in _device_eigh_batch(jnp.asarray(
                A, dtype=jnp.float32)))
w_h = np.linalg.eigvalsh(A)
assert np.abs(np.sort(w_d, axis=1) - w_h).max() < 1e-4 * np.abs(
    w_h).max()
# residual check covers eigenvectors without sign/order conventions
res = np.einsum('nij,njk->nik', A, V_d) - w_d[:, None, :] * V_d
assert np.abs(res).max() < 1e-3 * np.abs(w_h).max()
print("eigh ok")
""")
    _check(r, "eigh ok")
