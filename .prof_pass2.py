import os
os.environ["JAX_PLATFORMS"] = "cpu"
import time, sys, numpy as np, cProfile, pstats
from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import cartesian_partition

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mesh = hex_grid_mesh(nx, nx, nx)
topo = AgglomeratedTopology.from_mesh(mesh)
ctopo = topo.coarsen_local_partitioning(cartesian_partition((nx,nx,nx),(2,2,2)))
seq = DeRhamSequenceFE(topo, mesh, dtype=np.float32)
seq.set_upscaling_targets(0)
seq.cast_setup(np.float32)
pr = cProfile.Profile()
pr.enable(); seq.coarsen(); pr.disable()
st = pstats.Stats(pr)
print("== callees of _refresh_P ==")
st.print_callees('_refresh_P')
print("== callees of finalize_codim ==")
st.print_callees('finalize_codim')
print("== callees of tocsr ==")
st.print_callees('csr.py.*tocsr')
