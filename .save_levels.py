"""Build the flagship H1 levels once and cache to /tmp for kernel experiments."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys, time
import numpy as np
import scipy.sparse as sp

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
sys.argv = ['x']
import bench

t0 = time.time()
seqs, A, b = bench._build_h1(nx)
print(f"setup {time.time()-t0:.1f}s", flush=True)
A_levels = [sp.csr_matrix(A)]
P_levels = []
for l in range(len(seqs) - 1):
    P = sp.csr_matrix(seqs[l].P[0])
    P_levels.append(P)
    A_levels.append((P.T @ A_levels[-1] @ P).tocsr())

out = {"nlev": np.asarray(len(A_levels)), "b": b}
for l, Al in enumerate(A_levels):
    for nm, arr in (("data", Al.data), ("indices", Al.indices),
                    ("indptr", Al.indptr), ("shape", np.asarray(Al.shape))):
        out[f"A{l}_{nm}"] = arr
for l, Pl in enumerate(P_levels):
    for nm, arr in (("data", Pl.data), ("indices", Pl.indices),
                    ("indptr", Pl.indptr), ("shape", np.asarray(Pl.shape))):
        out[f"P{l}_{nm}"] = arr
np.savez(f"/tmp/h{nx}_levels.npz", **out)
print(f"saved /tmp/h{nx}_levels.npz", flush=True)
