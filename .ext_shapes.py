import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, sys
import parelag_tpu.amge.sequence as S
from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.amge.fespace import DeRhamSequenceFE
from parelag_tpu.partitioning.partitioners import cartesian_partition

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mesh = hex_grid_mesh(nx, nx, nx)
topo = AgglomeratedTopology.from_mesh(mesh)
topo.coarsen_local_partitioning(cartesian_partition((nx,nx,nx),(2,2,2)))
seq = DeRhamSequenceFE(topo, mesh, dtype=np.float32)
seq.set_upscaling_targets(0)
seq.cast_setup(np.float32)

orig = S.DeRhamSequence._extension
def wrapped(self, jform, codim_dom, use_lagrange, with_nulls=True):
    print(f"== ext jform={jform} codim={codim_dom} lagrange={use_lagrange} nulls={with_nulls}")
    return orig(self, jform, codim_dom, use_lagrange, with_nulls)
S.DeRhamSequence._extension = wrapped

import parelag_tpu.ops.ragged as Rg
orig_gb = Rg.group_by
def gb(sigs):
    g = orig_gb(sigs)
    if hasattr(sigs, 'shape') and sigs.ndim == 2 and sigs.shape[1] == 8:
        for sig, idxs in g.items():
            print("  group", tuple(int(x) for x in sig), "m=", len(idxs))
    return g
Rg.group_by = gb
seq.coarsen()
