"""Probe P/R block structure with and without coarse-centroid sorting."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys, time
import numpy as np
import scipy.sparse as sp

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
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
    An = (P.T @ A_levels[-1] @ P).tocsr()
    A_levels.append(An)

BR, BC = 8, 128


def stats(M, name):
    M = sp.csr_matrix(M)
    n, m = M.shape
    coo = M.tocoo()
    rb = coo.row // BR
    cb = coo.col // BC
    nbr = -(-n // BR)
    uk = np.unique(rb.astype(np.int64) * ((m // BC) + 1) + cb)
    ntiles = uk.size
    counts = np.bincount((uk // ((m // BC) + 1)).astype(np.int64),
                         minlength=nbr)
    kb = counts.max() if counts.size else 0
    tile_bytes = nbr * kb * BR * BC * 2
    coo_tile_bytes = ntiles * BR * BC * 2
    fill = M.nnz / max(ntiles * BR * BC, 1)
    print(f"  {name:<14} {n}x{m} nnz={M.nnz} ntiles={ntiles} kb={kb} "
          f"bcsr={tile_bytes/1e6:.1f}MB cootile={coo_tile_bytes/1e6:.1f}MB "
          f"fill={fill:.3f}")


def centroid_perm(P):
    """Order coarse dofs by mean fine row of their column nonzeros."""
    Pc = sp.csc_matrix(P)
    nc = Pc.shape[1]
    cent = np.zeros(nc)
    for j in range(nc):
        rows = Pc.indices[Pc.indptr[j]:Pc.indptr[j + 1]]
        cent[j] = rows.mean() if rows.size else 0
    return np.argsort(cent, kind="stable")


for l, P in enumerate(P_levels):
    P = sp.csr_matrix(P)
    print(f"L{l}: raw")
    stats(P, "P")
    stats(P.T.tocsr(), "R")
    pi = centroid_perm(P)
    Pp = P[:, pi]
    print(f"L{l}: centroid-sorted cols")
    stats(Pp, "P")
    stats(Pp.T.tocsr(), "R")
    # chained effect: rows of next P get permuted too; coarse A
    Ac = A_levels[l + 1]
    stats(Ac, "A_coarse raw")
    stats(sp.csr_matrix(Ac)[pi][:, pi], "A_coarse perm")
