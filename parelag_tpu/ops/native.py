"""ctypes bindings for the native host kernels (native/parelag_kernels.cpp).

The library is built on demand with g++ (no pip/pybind dependency); all
callers fall back to the numpy implementations when the toolchain or the
.so is unavailable, so the native layer is a pure accelerator.
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

# source location: the repo-root native/ directory next to the package in
# a checkout; installed trees (site-packages) don't carry it — set
# PARELAG_NATIVE_DIR to point at the sources in that case
_ROOT = os.environ.get(
    "PARELAG_NATIVE_DIR",
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_ROOT, "libparelag_kernels.so"))
    src = os.path.abspath(os.path.join(_ROOT, "parelag_kernels.cpp"))
    if not os.path.exists(src):
        import warnings
        warnings.warn(
            "parelag_tpu native kernels unavailable (no "
            f"parelag_kernels.cpp at {os.path.abspath(_ROOT)}); setup "
            "falls back to slower numpy paths. Set PARELAG_NATIVE_DIR to "
            "the repo's native/ directory to enable them.",
            RuntimeWarning, stacklevel=2)
        return None
    # Staleness via a source-hash sidecar (mtimes are unreliable after git
    # checkout). The .so is never committed; every checkout builds fresh.
    with open(src, "rb") as f:
        srchash = hashlib.sha256(f.read()).hexdigest()
    sidecar = so + ".srchash"
    stale = True
    if os.path.exists(so) and os.path.exists(sidecar):
        with open(sidecar) as f:
            stale = f.read().strip() != srchash
    if stale:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
            with open(sidecar, "w") as f:
                f.write(srchash)
        except Exception:
            if not os.path.exists(so):
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.csr_extract_dense.argtypes = [
        i64p, i64p, f64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
        i64p, f64p]
    lib.csr_extract_dense_i32.argtypes = [
        i32p, i32p, f64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
        i64p, f64p]
    lib.assemble_agglomerate_block.argtypes = [
        i64p, ctypes.c_int64, i64p, f64p, ctypes.c_int64, i64p,
        ctypes.c_int64, i64p, f64p]
    lib.ell_spmv.argtypes = [
        i32p, f64p, ctypes.c_int64, ctypes.c_int64, f64p, f64p]
    lib.csr_extract_dense_many.argtypes = [
        i64p, i64p, f64p, i64p, i64p, i64p, i64p, i64p, f64p, i64p,
        ctypes.c_int64]
    lib.csr_extract_dense_many_i32.argtypes = [
        i32p, i32p, f64p, i64p, i64p, i64p, i64p, i64p, f64p, i64p,
        ctypes.c_int64]
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.csr_extract_dense_many2.argtypes = [
        i64p, i64p, f64p, i64p, i64p, i64p, i64p, i64p, i64p, i64p,
        f64p, i64p, i64p, ctypes.c_int64]
    lib.csr_extract_dense_many2_i32.argtypes = [
        i32p, i32p, f64p, i64p, i64p, i64p, i64p, i64p, i64p, i64p,
        f64p, i64p, i64p, ctypes.c_int64]
    lib.csr_extract_dense_many2_f32.argtypes = [
        i64p, i64p, f32p, i64p, i64p, i64p, i64p, i64p, i64p, i64p,
        f32p, i64p, i64p, ctypes.c_int64]
    lib.csr_extract_dense_many2_i32_f32.argtypes = [
        i32p, i32p, f32p, i64p, i64p, i64p, i64p, i64p, i64p, i64p,
        f32p, i64p, i64p, ctypes.c_int64]
    lib.assemble_agglomerate_blocks_var_f32.argtypes = [
        i64p, i64p, i64p, i64p, f32p, i64p, i64p, i64p, i64p, f32p,
        i64p, ctypes.c_int64]
    lib.assemble_agglomerate_block_many.argtypes = [
        i64p, i64p, i64p, f64p, ctypes.c_int64, i64p, i64p, i64p, f64p,
        i64p, ctypes.c_int64]
    lib.assemble_agglomerate_blocks_var.argtypes = [
        i64p, i64p, i64p, i64p, f64p, i64p, i64p, i64p, i64p, f64p,
        i64p, ctypes.c_int64]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _pf(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def csr_extract_dense(indptr, indices, data, rows, cols, pos, out):
    lib = _load()
    if indptr.dtype == np.int32:
        lib.csr_extract_dense_i32(
            _p32(indptr), _p32(indices), _pf(data), _p64(rows),
            ctypes.c_int64(rows.size), _p64(cols),
            ctypes.c_int64(cols.size), _p64(pos), _pf(out))
    else:
        lib.csr_extract_dense(
            _p64(indptr), _p64(indices), _pf(data), _p64(rows),
            ctypes.c_int64(rows.size), _p64(cols),
            ctypes.c_int64(cols.size), _p64(pos), _pf(out))


def csr_extract_dense_many(indptr, indices, data, rows_cat, row_off,
                           cols_cat, col_off, pos, out_cat, out_off):
    lib = _load()
    nb = ctypes.c_int64(row_off.size - 1)
    if indptr.dtype == np.int32:
        lib.csr_extract_dense_many_i32(
            _p32(indptr), _p32(indices), _pf(data), _p64(rows_cat),
            _p64(row_off), _p64(cols_cat), _p64(col_off), _p64(pos),
            _pf(out_cat), _p64(out_off), nb)
    else:
        lib.csr_extract_dense_many(
            _p64(indptr), _p64(indices), _pf(data), _p64(rows_cat),
            _p64(row_off), _p64(cols_cat), _p64(col_off), _p64(pos),
            _pf(out_cat), _p64(out_off), nb)


def _pf32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def csr_extract_dense_many2(indptr, indices, data, rows_cat, row_beg,
                            row_end, cols_cat, col_beg, col_end, pos,
                            out_cat, out_beg, order):
    """Block extraction with explicit per-block ranges processed in
    `order` (callers sort by first row for cache locality). Dispatches
    on index dtype (i32/i64) and value dtype (f32/f64)."""
    lib = _load()
    nb = ctypes.c_int64(order.size)
    i32 = indptr.dtype == np.int32
    f32 = data.dtype == np.float32
    fn = (lib.csr_extract_dense_many2_i32_f32 if i32 and f32
          else lib.csr_extract_dense_many2_f32 if f32
          else lib.csr_extract_dense_many2_i32 if i32
          else lib.csr_extract_dense_many2)
    ip = _p32 if i32 else _p64
    vp = _pf32 if f32 else _pf
    fn(ip(indptr), ip(indices), vp(data), _p64(rows_cat), _p64(row_beg),
       _p64(row_end), _p64(cols_cat), _p64(col_beg), _p64(col_end),
       _p64(pos), vp(out_cat), _p64(out_beg), _p64(order), nb)


def assemble_agglomerate_block_many(ents_cat, ent_off, dofs, blocks,
                                    ae_dofs_cat, ae_off, pos, out_cat,
                                    out_off):
    lib = _load()
    k = dofs.shape[1]
    lib.assemble_agglomerate_block_many(
        _p64(ents_cat), _p64(ent_off), _p64(dofs), _pf(blocks),
        ctypes.c_int64(k), _p64(ae_dofs_cat), _p64(ae_off), _p64(pos),
        _pf(out_cat), _p64(out_off), ctypes.c_int64(ent_off.size - 1))


def assemble_agglomerate_blocks_var(ents_cat, ent_off, dof_cat, dof_off,
                                    blk_cat, blk_off, ae_dofs_cat, ae_off,
                                    pos, out_cat, out_off):
    lib = _load()
    if blk_cat.dtype == np.float32:
        lib.assemble_agglomerate_blocks_var_f32(
            _p64(ents_cat), _p64(ent_off), _p64(dof_cat), _p64(dof_off),
            _pf32(blk_cat), _p64(blk_off), _p64(ae_dofs_cat),
            _p64(ae_off), _p64(pos), _pf32(out_cat), _p64(out_off),
            ctypes.c_int64(ent_off.size - 1))
        return
    lib.assemble_agglomerate_blocks_var(
        _p64(ents_cat), _p64(ent_off), _p64(dof_cat), _p64(dof_off),
        _pf(blk_cat), _p64(blk_off), _p64(ae_dofs_cat), _p64(ae_off),
        _p64(pos), _pf(out_cat), _p64(out_off),
        ctypes.c_int64(ent_off.size - 1))


def assemble_agglomerate_block(ents, dofs, blocks, ae_dofs, pos, out):
    lib = _load()
    k = dofs.shape[1]
    lib.assemble_agglomerate_block(
        _p64(ents), ctypes.c_int64(ents.size), _p64(dofs), _pf(blocks),
        ctypes.c_int64(k), _p64(ae_dofs), ctypes.c_int64(ae_dofs.size),
        _p64(pos), _pf(out))
