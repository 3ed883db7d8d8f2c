import os
os.environ["JAX_PLATFORMS"] = "cpu"
import time, sys, numpy as np
from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import cartesian_partition
from parelag_tpu.utils.timing import TimeManager

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
t0=time.time()
mesh = hex_grid_mesh(nx, nx, nx)
topo = AgglomeratedTopology.from_mesh(mesh)
part = cartesian_partition((nx, nx, nx), (2, 2, 2))
ctopo = topo.coarsen_local_partitioning(part)
print(f"topo {time.time()-t0:.1f}", flush=True)
t0=time.time()
seq = DeRhamSequenceFE(topo, mesh, dtype=np.float32)
seq.set_upscaling_targets(0)
seq.cast_setup(np.float32)
print(f"fe+targets {time.time()-t0:.1f}", flush=True)
t0=time.time()
seq.coarsen()
print(f"L0 coarsen {time.time()-t0:.1f}", flush=True)
TimeManager.print_summary()
from parelag_tpu.ops import npalloc
print("npalloc:", npalloc.stats())
