"""Checkpoint/resume for setup-phase products.

The reference has no checkpointing — every run pays the full coarsening
cost. Here the expensive artifacts (the de Rham transfer operators and the
assembled solver hierarchy) are persistable so a solve-phase job can resume
without redoing setup:

  * save_pytree/load_pytree: any registered JAX pytree (Hierarchy,
    smoothers, EllMatrix/BcsrMatrix levels) -> one .npz + pickled treedef.
  * save_transfers/load_transfers: the per-form P/D/Pi scipy matrices of a
    coarsened DeRhamSequence chain.

Orbax is the natural tool for multi-host sharded state; for the host-side
setup products a flat npz keeps zero dependencies and loads anywhere.

SECURITY: checkpoints are TRUSTED-INPUT ONLY. The pytree structure is
serialized with pickle (jax treedefs have no other stable wire format), and
although loading runs through a restricted unpickler that only resolves
classes from jax/parelag_tpu/numpy modules, a maliciously crafted file could
still probe those namespaces. Never load a checkpoint file from an
untrusted source.
"""

import io
import pickle
import types

import numpy as np
import scipy.sparse as sp
import jax

# Exact (module, name) pairs a pickled jax treedef actually references
# (verified with pickletools.genops; spellings vary across jax releases).
_ALLOWED_EXACT = {
    ("jaxlib._jax.pytree", "PyTreeDef"),
    ("jaxlib.xla_extension.pytree", "PyTreeDef"),
    ("jaxlib.xla_extension", "PyTreeDef"),
    ("jax._src.tree_util", "default_registry"),
    ("jax.tree_util", "default_registry"),
    ("numpy", "dtype"),
    ("numpy", "ndarray"),
}

_ALLOWED_BUILTINS = frozenset((
    "tuple", "list", "dict", "set", "frozenset", "slice",
    "complex", "bytes", "bytearray", "int", "float", "bool",
    "str", "object", "NoneType"))


class _RestrictedUnpickler(pickle.Unpickler):
    """Unpickler that resolves only the exact jax/numpy globals a treedef
    needs plus parelag_tpu pytree-node *classes* — blocks the classic
    os.system/posix payloads, module smuggling through allowed packages
    (e.g. a module-level `subprocess` import inside parelag_tpu), and the
    builtins.getattr REDUCE gadget."""

    def find_class(self, module, name):
        if module == "builtins":
            if name not in _ALLOWED_BUILTINS:
                raise pickle.UnpicklingError(
                    f"checkpoint references disallowed builtin {name}")
            return super().find_class(module, name)
        if (module, name) in _ALLOWED_EXACT:
            return super().find_class(module, name)
        # Framework pytree node types: must resolve to a class defined in
        # a parelag_tpu module (not a module, not a re-exported function).
        if module == "parelag_tpu" or module.startswith("parelag_tpu."):
            obj = super().find_class(module, name)
            if isinstance(obj, types.ModuleType) or not isinstance(
                    obj, type):
                raise pickle.UnpicklingError(
                    f"checkpoint references non-class global "
                    f"{module}.{name}")
            if not getattr(obj, "__module__", "").startswith("parelag_tpu"):
                raise pickle.UnpicklingError(
                    f"checkpoint references foreign class {module}.{name}")
            return obj
        raise pickle.UnpicklingError(
            f"checkpoint references disallowed global {module}.{name}")


def save_pytree(tree, path):
    """Persist any pytree of device/NumPy arrays (e.g. a solver Hierarchy)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def load_pytree(path, device=True):
    """Restore a pytree saved by save_pytree. device=True puts array leaves
    back on the default device (jnp), else keeps NumPy.

    Trusted-input only (see module docstring): the treedef is unpickled
    through a restricted unpickler limited to jax/parelag_tpu/numpy."""
    import jax.numpy as jnp
    with np.load(path, allow_pickle=False) as z:
        treedef = _RestrictedUnpickler(
            io.BytesIO(z["treedef"].tobytes())).load()
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    if device:
        leaves = [jnp.asarray(l) if isinstance(l, np.ndarray) else l
                  for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _csr_pack(d, key, M):
    M = sp.csr_matrix(M)
    d[f"{key}_data"] = M.data
    d[f"{key}_indices"] = M.indices
    d[f"{key}_indptr"] = M.indptr
    d[f"{key}_shape"] = np.asarray(M.shape)


def _csr_unpack(z, key):
    return sp.csr_matrix(
        (z[f"{key}_data"], z[f"{key}_indices"], z[f"{key}_indptr"]),
        shape=tuple(z[f"{key}_shape"]))


def save_transfers(seqs, path):
    """Persist the coarsening products of a DeRhamSequence chain: per level
    and form the interpolation P, derivative D, and projector Pi."""
    d = {"n_levels": np.asarray(len(seqs))}
    for l, s in enumerate(seqs):
        nf = len(s.D)
        d[f"lev{l}_nforms"] = np.asarray(nf + 1)
        for j in range(nf):
            if s.D[j] is not None:
                _csr_pack(d, f"lev{l}_D{j}", s.D[j])
        if getattr(s, "P", None) is not None:
            for j, Pj in enumerate(s.P):
                if Pj is not None:
                    _csr_pack(d, f"lev{l}_P{j}", Pj)
        if getattr(s, "Pi", None) is not None:
            for j, Pij in enumerate(s.Pi):
                if Pij is not None:
                    _csr_pack(d, f"lev{l}_Pi{j}",
                              Pij.matrix if hasattr(Pij, "matrix") else Pij)
    np.savez_compressed(path, **d)


def load_transfers(path):
    """Restore {level: {"P": [..], "D": [..], "Pi": [..]}} scipy matrices."""
    out = []
    with np.load(path) as z:
        n_levels = int(z["n_levels"])
        for l in range(n_levels):
            nf = int(z[f"lev{l}_nforms"]) - 1
            lev = {"P": [None] * (nf + 1), "D": [None] * nf,
                   "Pi": [None] * (nf + 1)}
            for j in range(nf):
                if f"lev{l}_D{j}_data" in z.files:
                    lev["D"][j] = _csr_unpack(z, f"lev{l}_D{j}")
            for j in range(nf + 1):
                if f"lev{l}_P{j}_data" in z.files:
                    lev["P"][j] = _csr_unpack(z, f"lev{l}_P{j}")
                if f"lev{l}_Pi{j}_data" in z.files:
                    lev["Pi"][j] = _csr_unpack(z, f"lev{l}_Pi{j}")
            out.append(lev)
    return out
