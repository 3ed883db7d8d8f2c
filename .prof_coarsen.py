import time, sys, numpy as np
import cProfile, pstats
from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import cartesian_partition

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 96
mesh = hex_grid_mesh(nx, nx, nx)
topo = AgglomeratedTopology.from_mesh(mesh)
part = cartesian_partition((nx, nx, nx), (2, 2, 2))
ctopo = topo.coarsen_local_partitioning(part)
seq = DeRhamSequenceFE(topo, mesh, dtype=np.float32)
seq.set_upscaling_targets(0)
seq.cast_setup(np.float32)
pr = cProfile.Profile()
t0 = time.time()
pr.enable()
seq.coarsen()
pr.disable()
print(f"L0 coarsen {time.time()-t0:.1f}s", flush=True)
st = pstats.Stats(pr)
st.sort_stats('tottime').print_stats(22)
