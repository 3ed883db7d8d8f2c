"""Distributed-solve bench lane: times the fully sharded L-level V-cycle
PCG step over a virtual device mesh.

Run as a subprocess from bench.py with
  XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu
(the axon TPU is one chip; the dd-axis collectives are exercised on the
virtual CPU mesh — correctness of the sharded step is digit-exact vs
serial by tests/test_dist_hierarchy.py, this lane tracks its wall-clock
so collective-structure regressions show up in BENCH numbers).

Reference analog: the weak-scaling drivers examples/3DHdivWeakScaling.cpp
(timing tables over MPI ranks).
"""

import json
import sys
import time

import numpy as np


def distributed_solve_bench(n_devices=8, ny_per_rank=4, steps=20):
    import jax
    # the axon TPU plugin ignores JAX_PLATFORMS — force the (virtual
    # multi-device) CPU platform through jax.config before first use
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < n_devices:
        import jax.extend.backend as _jeb
        _jeb.clear_backends()
    import jax.numpy as jnp
    from parelag_tpu.mesh.mesh import hex_grid_mesh
    from parelag_tpu.parallel.sharding import Mesh, distributed_mg_l_step
    from parelag_tpu.parallel.dist_hierarchy import (
        distributed_coarsen_multilevel, distributed_operator_setup,
        build_hierarchy_from_setup, distributed_rhs, compose_partitions)
    from parelag_tpu.partitioning.partitioners import cartesian_partition

    n = n_devices
    devs = jax.devices()
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    mesh = Mesh(np.array(devs[:n]), ("dd",))

    grid = (16, ny_per_rank * n, 20)
    m = hex_grid_mesh(*grid)
    partitions = [
        cartesian_partition(grid, (2, 2, 2)),
        cartesian_partition((8, ny_per_rank * n // 2, 10), (2, 2, 2)),
        cartesian_partition((4, ny_per_rank * n // 4, 5),
                            (4, ny_per_rank * n // 4 // n, 5)),
    ]
    rank_of_elem = compose_partitions(partitions)[-1]

    t0 = time.time()
    patches, gents = distributed_coarsen_multilevel(
        m, rank_of_elem, partitions, n, upscaling_order=0)

    def patch_A(p):
        s = p.seqs[0]
        M = s.compute_mass_operator(0)
        W = s.compute_mass_operator(1)
        return (M + s.D[0].T @ W @ s.D[0]).tocsr()

    setup = distributed_operator_setup(
        patches, gents, 0, patch_A, rank_of_elem)
    hier = build_hierarchy_from_setup(setup, n, dtype=np.float32)
    b = distributed_rhs(
        setup, patches,
        lambda p: p.seqs[0].domain_lf_scalar(0, lambda q: q[..., 0]))
    setup_s = time.time() - t0

    levels_args, cinv, g2v = hier.device_args()
    step = jax.jit(distributed_mg_l_step(mesh, hier)(levels_args))
    s0 = hier.systems[0]
    bb = jnp.asarray(s0.to_local(b.astype(np.float32)))
    x = jnp.zeros_like(bb)
    args = (x, bb, bb, jnp.zeros_like(bb))
    out = step(levels_args, cinv, g2v, *args)
    for o in out:
        np.asarray(o)
    ndofs = int(setup.ndofs[0])

    def batch(k):
        t0 = time.time()
        st = args
        for _ in range(k):
            st = step(levels_args, cinv, g2v, *st)
        float(np.asarray(st[0]).ravel()[0])
        return time.time() - t0

    batch(3)
    t1, t2 = batch(5), batch(5 + steps)
    dt = (t2 - t1) / steps
    if dt <= 0:
        dt = t2 / (5 + steps)
    return dict(lane="dist", metric="distributed_mg_step",
                n_devices=n, ndofs=ndofs, levels=len(setup.ndofs),
                setup_s=setup_s, step_s=dt,
                value=ndofs / dt, unit="dof_per_s")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(json.dumps(distributed_solve_bench(n)))
