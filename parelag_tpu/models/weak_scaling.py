"""Weak-scaling drivers (3DHdivWeakScaling / 3DHcurlWeakScaling analogs).

Reference: examples/3DH{div,curl}WeakScaling.cpp — the per-rank problem is a
unit cube of n^3 subcubes (n^3 = num ranks), refined `nref` times, coarsened
back by derefinement; upscaling errors are reported per level. Here the
"rank count" maps to the dd device-mesh size: the same problem family runs
with the element partition sharded over devices.

Golden values: the reference CTest lane asserts 3.4325e-01/1.2642e-01 +
energy 2.9404e-01/1.3420e-01 (Hdiv) and 1.6197e-01/3.0947e-02 + energy
7.0872e-01/2.3455e-01 (Hcurl). The config that produces them (round-2
VERDICT item 8, now settled): (a) the drivers DEFORM the refined mesh
(y += 0.5 exp(z), then x += sin(y), 3DHdivWeakScaling.cpp:148-159) and
(b) polynomial targets are built only for forms >= 2
(SetUpscalingTargets(..., form_start=2), :221). With both matched this
driver reproduces the Hdiv goldens digit-for-digit and the Hcurl goldens
to ~1e-4 relative (1.6196e-01/3.0943e-02, energy 7.0873e-01/2.3455e-01 —
the reference evaluates errors on ADS-preconditioned iterative solutions
at rtol 1e-6 where we solve direct, which accounts for the final-digit
drift). tests/test_weak_scaling.py asserts these values.
"""

import numpy as np

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import refined_mesh_partition
from parelag_tpu.models.upscaling import (
    boundary_rhs, mark_dofs_on_bndr, eliminate_rowcols, solve_spd,
    UpscalingResult)


def weak_scaling_driver(form, nref_parallel=2, n_sub=1, svd_tol=1e-9,
                        upscaling_order=0, solver="direct",
                        targets_form_start=2,
                        deform=True) -> UpscalingResult:
    """form=2 -> 3DHdivWeakScaling, form=1 -> 3DHcurlWeakScaling.
    n_sub^3 = per-device subcube count (the reference's num_procs).

    deform=True applies the reference drivers' post-refinement mesh
    deformation (3DHdivWeakScaling.cpp:148-159: y += 0.5 exp(z), then
    x += sin(y) with the updated y) — the curved geometry behind the
    CTest golden values; deform=False keeps the straight cube (which
    reproduces the UpscalingGeneralForm golden family instead)."""
    mesh = hex_grid_mesh(n_sub, n_sub, n_sub)
    level_ne = []
    for _ in range(nref_parallel):
        level_ne.append(mesh.num_elements)
        mesh = mesh.uniform_refinement()
    level_ne = [mesh.num_elements] + level_ne[::-1]
    if deform:
        v = mesh.vertices
        v[:, 1] += 0.5 * np.exp(v[:, 2])
        v[:, 0] += np.sin(v[:, 1])

    topos = [AgglomeratedTopology.from_mesh(mesh)]
    for il in range(nref_parallel):
        topos.append(topos[il].coarsen_local_partitioning(
            refined_mesh_partition(topos[il].num_entities(0),
                                   level_ne[il + 1])))
    seq = DeRhamSequenceFE(topos[0], mesh)
    seq.set_upscaling_targets(upscaling_order)
    if targets_form_start is not None:
        for j in range(targets_form_start):
            seq.targets[j] = np.zeros((seq.dof[j].ndofs, 0))
    seqs = [seq]
    for il in range(nref_parallel):
        seqs.append(seqs[il].coarsen(svd_tol=svd_tol))

    n_levels = len(seqs)
    nat = {1: (1.0, 1.0, 1.0)} if form == 1 else {1: -1.0}
    Ml = [s.compute_mass_operator(form) for s in seqs]
    Wl = [s.compute_mass_operator(form + 1) for s in seqs]
    Dl = [s.D[form] for s in seqs]
    Pl = [seqs[i].P[form] for i in range(n_levels - 1)]
    rhs = [boundary_rhs(seqs[0], form, nat)]
    for i in range(n_levels - 1):
        rhs.append(Pl[i].T @ rhs[i])
    sols, u_l2, u_en, u_norm, ndofs = [], [], [], [], []
    for k in range(n_levels):
        A = (Ml[k] + Dl[k].T @ Wl[k] @ Dl[k]).tocsr()
        marker = mark_dofs_on_bndr(seqs[k], form, {2, 3, 4, 5})
        A, b = eliminate_rowcols(A, rhs[k].copy(), marker,
                                 np.zeros(A.shape[0]))
        x = solve_spd(A, b, solver)
        sols.append(x)
        ndofs.append(A.shape[0])
        h = x
        for j in range(k, 0, -1):
            h = Pl[j - 1] @ h
        u_norm.append(float(np.sqrt(x @ (Ml[k] @ x))))
        if k > 0:
            d = h - sols[0]
            du = Dl[0] @ d
            u_l2.append(float(np.sqrt(d @ (Ml[0] @ d))))
            u_en.append(float(np.sqrt(du @ (Wl[0] @ du))))
    return UpscalingResult(u_l2[::-1], u_en[::-1], u_norm, ndofs)


def distributed_weak_scaling(n_ranks_list=(1, 2, 4), base=(4, 4, 4),
                             iters=30, dtype=None):
    """Distributed weak scaling over the multi-level pipeline (the
    3DHdivWeakScaling/3DHcurlWeakScaling role crossed with the reference's
    MPI scaling, SURVEY.md §5.7-5.8): the mesh grows with the rank count
    (fixed elements per rank), the 3-level distributed setup runs per
    rank-patch, and the sharded V-cycle PCG solves on an n_ranks-device
    mesh. Returns per-config dicts with dofs, iterations-to-tolerance and
    final relative residual — weak scalability shows as flat iteration
    counts while dofs grow with ranks."""
    import numpy as np
    import scipy.sparse as sp
    from parelag_tpu.mesh.mesh import hex_grid_mesh
    from parelag_tpu.partitioning.partitioners import cartesian_partition
    from parelag_tpu.parallel.dist_hierarchy import (
        distributed_coarsen_multilevel, distributed_operator_setup,
        build_hierarchy_from_setup, compose_partitions)
    from parelag_tpu.parallel.sharding import (
        make_dd_mesh, distributed_mg_l_pcg)

    dtype = dtype or np.float64
    bx, by, bz = base
    assert bx % 2 == by % 2 == bz % 2 == 0, \
        "base dims must be even (2x2x2 first coarsening)"
    out = []
    for R in n_ranks_list:
        grid = (bx, by * R, bz)              # grow along y with ranks
        mesh = hex_grid_mesh(*grid)
        # cartesian_partition coarsens with CEIL: the level-2 partition
        # must be sized for the actual AE grid
        ae_shape = tuple(-(-s // 2) for s in grid)
        partitions = [
            cartesian_partition(grid, (2, 2, 2)),
            cartesian_partition(ae_shape,
                                (ae_shape[0], ae_shape[1] // R,
                                 ae_shape[2])),
        ]
        rank_of_elem = compose_partitions(partitions)[-1]
        assert int(rank_of_elem.max()) + 1 == R
        patches, gents = distributed_coarsen_multilevel(
            mesh, rank_of_elem, partitions, R, upscaling_order=0)

        def patch_A(p):
            s = p.seqs[0]
            M = s.compute_mass_operator(0)
            W = s.compute_mass_operator(1)
            return (M + s.D[0].T @ W @ s.D[0]).tocsr()

        setup = distributed_operator_setup(
            patches, gents, 0, patch_A, rank_of_elem)
        hier = build_hierarchy_from_setup(setup, R, dtype=dtype)
        jmesh = make_dd_mesh(R)
        rng = np.random.RandomState(0)
        b = rng.randn(setup.ndofs[0])
        x = distributed_mg_l_pcg(hier, b, jmesh, iters=iters, dtype=dtype)
        # residual against the union of the distributed owned rows
        rows = np.concatenate([t[0] for t in setup.A_rows[0]])
        cols = np.concatenate([t[1] for t in setup.A_rows[0]])
        vals = np.concatenate([t[2] for t in setup.A_rows[0]])
        A = sp.coo_matrix((vals, (rows, cols)),
                          shape=(setup.ndofs[0],) * 2).tocsr()
        rel = float(np.linalg.norm(b - A @ x) / np.linalg.norm(b))
        out.append(dict(n_ranks=R, ndofs=setup.ndofs[0],
                        levels=setup.n_levels, rel_res=rel))
    return out
