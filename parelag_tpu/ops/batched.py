"""Bucketed, padded, batched dense linear algebra for per-agglomerate work.

The coarsening hot loops (SURVEY.md §3.5: per-AE saddle-point factor+solve,
per-AE SVD/eigensolve) are many independent small dense problems of ragged
sizes. The TPU-native execution: bucket by padded shape, pad, and run ONE
vmapped device call per bucket (recompile count bounded by the bucket count).

Padding a linear system appends identity rows/columns and zero RHS columns,
which leaves the original solution block unchanged.
"""

import numpy as np

_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


def _round_bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return int(-(-n // 1024) * 1024)


def batched_solve(systems, rhs, backend="auto"):
    """Solve systems[i] @ X[i] = rhs[i] for ragged lists of dense (n_i, n_i)
    matrices and (n_i, k_i) right-hand sides. Returns list of (n_i, k_i)
    solutions.

    backend 'host'  -> scipy LU loop;
            'device'-> bucketed vmapped jnp.linalg.solve;
            'auto'  -> device when a non-CPU jax backend is default and the
                       batch is large enough to amortize dispatch.
    """
    n_items = len(systems)
    if n_items == 0:
        return []
    if backend == "auto":
        # setup runs in float64; the TPU f64 path is software-emulated (and
        # unreliable on the experimental axon platform), so auto only takes
        # the device route for f32 data on an accelerator backend
        backend = "host"
        try:
            import jax
            if (jax.default_backend() != "cpu" and n_items >= 64
                    and all(s.dtype == np.float32 for s in systems[:1])):
                backend = "device"
        except Exception:
            pass

    if backend == "host":
        import scipy.linalg
        out = []
        for A, b in zip(systems, rhs):
            if A.shape[0] == 0 or b.shape[1] == 0:
                out.append(np.zeros_like(b))
            else:
                out.append(scipy.linalg.lu_solve(
                    scipy.linalg.lu_factor(A), b))
        return out

    import jax
    import jax.numpy as jnp

    buckets = {}
    for i, (A, b) in enumerate(zip(systems, rhs)):
        n, k = A.shape[0], b.shape[1]
        if n == 0 or k == 0:
            continue
        key = (_round_bucket(n), _round_bucket(k))
        buckets.setdefault(key, []).append(i)

    out = [np.zeros_like(b) for b in rhs]
    for (nb, kb), idxs in buckets.items():
        m = len(idxs)
        Ab = np.tile(np.eye(nb), (m, 1, 1))
        Bb = np.zeros((m, nb, kb))
        for j, i in enumerate(idxs):
            n, k = systems[i].shape[0], rhs[i].shape[1]
            Ab[j, :n, :n] = systems[i]
            Ab[j, :n, n:] = 0.0
            Ab[j, n:, :n] = 0.0
            Bb[j, :n, :k] = rhs[i]
        X = np.asarray(_solve_batch(jnp.asarray(Ab), jnp.asarray(Bb)))
        for j, i in enumerate(idxs):
            n, k = systems[i].shape[0], rhs[i].shape[1]
            out[i] = X[j, :n, :k]
    return out


def _solve_batch(A, B):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(A, B):
        return jnp.linalg.solve(A, B)
    return f(A, B)


def batched_svd_basis(mats, backend="auto"):
    """Left singular vectors + singular values for a ragged list of (n_i, k)
    matrices (the trace/null SVD stage). Returns list of (U_i, s_i)."""
    n_items = len(mats)
    if n_items == 0:
        return []
    if backend == "auto":
        backend = "host"
        try:
            import jax
            if (jax.default_backend() != "cpu" and n_items >= 64
                    and all(m.dtype == np.float32 for m in mats[:1])):
                backend = "device"
        except Exception:
            pass
    if backend == "host":
        out = []
        for T in mats:
            if T.shape[0] == 0 or T.shape[1] == 0:
                out.append((np.zeros((T.shape[0], 0)), np.zeros(0)))
            else:
                U, s, _ = np.linalg.svd(T, full_matrices=False)
                out.append((U, s))
        return out

    import jax.numpy as jnp
    import jax
    buckets = {}
    for i, T in enumerate(mats):
        n, k = T.shape
        if n == 0 or k == 0:
            continue
        buckets.setdefault((_round_bucket(n), _round_bucket(k)),
                           []).append(i)
    out = [(np.zeros((T.shape[0], 0)), np.zeros(0)) for T in mats]
    for (nb, kb), idxs in buckets.items():
        m = len(idxs)
        Tb = np.zeros((m, nb, kb))
        for j, i in enumerate(idxs):
            n, k = mats[i].shape
            Tb[j, :n, :k] = mats[i]

        @jax.jit
        def f(T):
            return jnp.linalg.svd(T, full_matrices=False)
        U, s, _ = f(jnp.asarray(Tb))
        U = np.asarray(U)
        s = np.asarray(s)
        for j, i in enumerate(idxs):
            n, k = mats[i].shape
            kk = min(n, k)
            out[i] = (U[j, :n, :kk], s[j, :kk])
    return out
