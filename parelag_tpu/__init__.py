"""parelag_tpu — TPU-native element-agglomeration AMGe on the de Rham complex.

A from-scratch JAX/XLA framework with the capabilities of LLNL/ParElag
(reference: /root/reference, C++/MPI on MFEM+hypre): operator-dependent
numerical upscaling and AMGe solvers for H1 / H(curl) / H(div) / L2
discretizations.

Architecture (TPU-first, not a port):
  * mesh topology & agglomeration  -> integer index arrays + scipy CSR on host
  * per-agglomerate local problems -> padded, bucketed batched dense kernels
                                      (vmap/Pallas) on device
  * solve phase (SpMV, smoothers, Krylov, V-cycle) -> jitted JAX on device
  * distribution -> one mesh-partition axis via jax.sharding / shard_map
                    (the reference's MPI domain decomposition analog)
"""

__version__ = "0.1.0"


def _tune_malloc():
    """Keep large allocations on the heap instead of per-allocation mmap
    (glibc mallopt M_MMAP_THRESHOLD / M_TRIM_THRESHOLD).

    The setup phase streams many ~100MB-1GB numpy temporaries; with
    glibc's default mmap behavior every one is returned to the OS on free
    and re-faulted page-by-page on the next allocation — measured at
    ~75 MB/s first-touch on virtualized hosts vs 14 GB/s steady-state
    (3.3 s to allocate+copy 240 MB without tuning, 0.25 s with). This is
    the framework's MemoryUtils analog (reference
    src/utilities/MemoryUtils.hpp). Disable with PARELAG_MALLOC_TUNE=0.
    Trade-off: process high-water RSS stays allocated (not returned to
    the OS between phases)."""
    import os
    if os.environ.get("PARELAG_MALLOC_TUNE", "1") in ("0", "false"):
        return
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt.argtypes = [ctypes.c_int, ctypes.c_int]
        libc.mallopt.restype = ctypes.c_int
        # effectively infinite (INT_MAX — mallopt takes a C int, and a
        # wider Python value would be silently truncated by ctypes:
        # 1 << 44 masks to 0, the exact opposite setting): every
        # allocation rides the brk heap and freed space is NEVER
        # returned to the OS — on the deployment hosts, released pages
        # lose their (slowly-acquired) host backing, so the heap must
        # hold its high-water mark
        libc.mallopt(-3, 0x7FFFFFFF)    # M_MMAP_THRESHOLD
        libc.mallopt(-1, 0x7FFFFFFF)    # M_TRIM_THRESHOLD
        # single arena: prefault()'s background thread must feed the
        # same free lists the main thread allocates from
        libc.mallopt(-8, 1)             # M_ARENA_MAX
    except Exception:                   # non-glibc platforms: no-op
        pass


def _lock_memory():
    """Pin the process's pages (mlockall MCL_CURRENT|MCL_FUTURE).

    Virtualized hosts running proactive reclaim (DAMON/khugepaged) evict
    this process's cold pages even with >95% of RAM free; the refault
    path then runs at ~10-75 MB/s and setup-phase numpy temporaries that
    cost 0.3 s warm were measured at 33 s cold — a 100x swing. Locking
    removes the eviction and makes mmap growth bulk-populate instead of
    per-page faulting. Only applied when the host has plenty of headroom
    (>16 GB MemAvailable); disable with PARELAG_MLOCK=0. MCL_ONFAULT is
    deliberately NOT used: the per-page fault path is exactly what's
    slow on these hosts."""
    import os
    if os.environ.get("PARELAG_MLOCK", "1") in ("0", "false"):
        return
    try:
        with open("/proc/meminfo") as f:
            avail_kb = 0
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_kb = int(line.split()[1])
                    break
        if avail_kb < 16 * 1024 * 1024:
            return
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mlockall(3)             # MCL_CURRENT | MCL_FUTURE
    except Exception:                # non-Linux / no permission: no-op
        pass


def _install_np_allocator():
    """Route numpy array data through the caching size-class allocator
    (native/parelag_npalloc.c): freed >=1 MB blocks keep their populated
    pages and are reused, so the GB-scale setup temporaries never re-pay
    the (phase-dependent, up to 100x) first-touch population cost.
    Disable with PARELAG_NPALLOC=0; cap via PARELAG_NPALLOC_CAP_GB."""
    import os
    if os.environ.get("PARELAG_NPALLOC", "1") in ("0", "false"):
        return
    try:
        from parelag_tpu.ops import npalloc
        cap = int(float(os.environ.get("PARELAG_NPALLOC_CAP_GB", "48"))
                  * (1 << 30))
        npalloc.install(cap)
    except Exception:
        pass


def prefault(gb, background=True):
    """Acquire host backing for ~`gb` GB of heap ahead of need.

    The deployment hosts back roughly the first 5-6 GB of a process
    fast; beyond that, FRESH pages arrive at 10-100 MB/s (host-side,
    one-time per page — see DESIGN.md). A large job that lets this
    happen on demand stalls its compute at every big allocation.
    prefault() walks the heap up front — by default on a background
    thread; the memory is malloc'd, touched, and freed, so it lands in
    the (never-trimmed, single-arena) free lists every later numpy
    allocation draws from. OPT-IN and deliberately not called anywhere
    by default: measured on the flagship build, a background prefault
    racing a compute phase that itself allocates both contends for the
    host's backing path and fragments the heap (interleaved chunk
    ownership defeats coalescing), a net loss. Use it only BEFORE any
    compute, e.g. while waiting on an accelerator session warmup.
    Returns the Thread (or None when foreground/failed)."""
    import ctypes
    import threading

    def _touch():
        try:
            libc = ctypes.CDLL("libc.so.6")
            libc.malloc.restype = ctypes.c_void_p
            libc.malloc.argtypes = [ctypes.c_size_t]
            libc.free.argtypes = [ctypes.c_void_p]
            step = 256 << 20
            blocks = []
            for _ in range(max(1, int(gb * (1 << 30)) // step)):
                p = libc.malloc(step)
                if not p:
                    break
                ctypes.memset(p, 0, step)
                blocks.append(p)
            for p in blocks:
                libc.free(p)
        except Exception:
            pass

    if not background:
        _touch()
        return None
    t = threading.Thread(target=_touch, name="parelag-prefault",
                         daemon=True)
    t.start()
    return t


_tune_malloc()
_lock_memory()
_install_np_allocator()

from parelag_tpu.mesh.mesh import (
    Mesh, hex_grid_mesh, quad_grid_mesh, read_mesh)
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.partitioning.partitioners import (
    refined_mesh_partition, cartesian_partition, geometric_box_partition,
    logical_partition, graph_partition)

# jax-heavy subsystems load lazily so host-only topology work stays light
_LAZY = {
    "DeRhamSequenceFE": ("parelag_tpu.amge.fespace", "DeRhamSequenceFE"),
    "DeRhamSequence2DFE": ("parelag_tpu.amge.fespace2d",
                           "DeRhamSequence2DFE"),
    "SolverLibrary": ("parelag_tpu.solvers.library", "SolverLibrary"),
    "SolverState": ("parelag_tpu.solvers.library", "SolverState"),
    "ParameterList": ("parelag_tpu.utils.params", "ParameterList"),
    "read_xml": ("parelag_tpu.utils.params", "read_xml"),
    "build_amge_hierarchy": ("parelag_tpu.solvers.amge_solver",
                             "build_amge_hierarchy"),
    "amge_pcg_solve": ("parelag_tpu.solvers.amge_solver", "amge_pcg_solve"),
    "Hierarchy": ("parelag_tpu.solvers.hierarchy", "Hierarchy"),
    "build_hierarchy": ("parelag_tpu.solvers.hierarchy", "build_hierarchy"),
    "HybridHdivL2": ("parelag_tpu.amge.hybridization", "HybridHdivL2"),
    "write_vtk": ("parelag_tpu.mesh.vtk", "write_vtk"),
    "save_agglomerates_vtk": ("parelag_tpu.mesh.vtk",
                              "save_agglomerates_vtk"),
    "TimeManager": ("parelag_tpu.utils.timing", "TimeManager"),
    "save_pytree": ("parelag_tpu.utils.checkpoint", "save_pytree"),
    "load_pytree": ("parelag_tpu.utils.checkpoint", "load_pytree"),
    # round 3: arbitrary order, multi-level distribution, partitioning
    "DeRhamSequence3DFE_HO": ("parelag_tpu.amge.fespace3d_ho",
                              "DeRhamSequence3DFE_HO"),
    "DeRhamSequenceTetFE_HO": ("parelag_tpu.amge.fespace3d_tet_ho",
                               "DeRhamSequenceTetFE_HO"),
    "DeRhamSequence2DFE_HO": ("parelag_tpu.amge.fespace2d_ho",
                              "DeRhamSequence2DFE_HO"),
    "build_ml_hiptmair": ("parelag_tpu.solvers.amge_solver",
                          "build_ml_hiptmair"),
    "GhostMap": ("parelag_tpu.parallel.ghost", "GhostMap"),
    "parmetis_kway": ("parelag_tpu.parallel.dist_partition",
                      "parmetis_kway"),
    "metis_material_partition": ("parelag_tpu.partitioning.partitioners",
                                 "metis_material_partition"),
    "distributed_coarsen_multilevel": (
        "parelag_tpu.parallel.dist_hierarchy",
        "distributed_coarsen_multilevel"),
    "distributed_operator_setup": ("parelag_tpu.parallel.dist_hierarchy",
                                   "distributed_operator_setup"),
    "build_hierarchy_from_setup": ("parelag_tpu.parallel.dist_hierarchy",
                                   "build_hierarchy_from_setup"),
    "assert_invariants": ("parelag_tpu.utils.errors", "assert_invariants"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'parelag_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
