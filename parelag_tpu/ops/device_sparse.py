"""Device sparse-matrix substrate (JAX).

TPU-native replacement for hypre ParCSR matvec machinery (reference
hypreExtension + mfem::SparseMatrix::Mult throughout the solve phase): the
solve-phase operators live on device in ELL (padded-row) layout, so SpMV is a
dense gather + row reduction — static shapes, MXU/VPU-friendly, and vmappable.

ELL layout: indices (n, k) int32, values (n, k) dtype, with padding entries
pointing at column 0 with value 0. k = max row nnz (optionally rounded up to
a lane multiple).
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class EllMatrix:
    indices: jnp.ndarray    # (n, k) int32
    values: jnp.ndarray     # (n, k)
    shape: tuple            # (n, m) static

    def tree_flatten(self):
        return (self.indices, self.values), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @property
    def dtype(self):
        return self.values.dtype

    def matvec(self, x):
        return ell_matvec(self, x)

    def __matmul__(self, x):
        return ell_matvec(self, x)


def from_scipy(A, dtype=None, pad_to=None) -> EllMatrix:
    """Convert scipy sparse to device ELL."""
    A = sp.csr_matrix(A)
    n, m = A.shape
    dtype = dtype or A.dtype
    nnz_per_row = np.diff(A.indptr)
    k = int(nnz_per_row.max()) if n else 0
    k = max(k, 1)
    if pad_to:
        k = -(-k // pad_to) * pad_to
    indices = np.zeros((n, k), dtype=np.int32)
    values = np.zeros((n, k), dtype=dtype)
    for i in range(n):
        s, e = A.indptr[i], A.indptr[i + 1]
        indices[i, : e - s] = A.indices[s:e]
        values[i, : e - s] = A.data[s:e]
    return EllMatrix(jnp.asarray(indices), jnp.asarray(values), (n, m))


@jax.jit
def ell_matvec(A: EllMatrix, x):
    """y_i = sum_k vals[i,k] * x[idx[i,k]] — gather + row reduce."""
    return jnp.einsum("nk,nk->n", A.values, x[A.indices])


def ell_matvec_T(A: EllMatrix, x):
    """y = A^T x via scatter-add (for restriction when only P is stored)."""
    contrib = A.values * x[:, None]
    return jnp.zeros(A.shape[1], dtype=A.values.dtype).at[
        A.indices].add(contrib)


def diag_of(A_scipy) -> np.ndarray:
    return sp.csr_matrix(A_scipy).diagonal()


def l1_row_weights(A_scipy) -> np.ndarray:
    """l1-Jacobi weights: d_i = sum_j |a_ij| (reference Weightedl1Smoother
    row weights, ParELAG_MatrixUtils.hpp:40-142); spectrally safe diagonal
    smoother, the TPU-idiomatic substitute for hypre's sequential L1-GS."""
    A = sp.csr_matrix(A_scipy)
    return np.asarray(np.abs(A).sum(axis=1)).ravel()
