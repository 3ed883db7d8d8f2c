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

from parelag_tpu.mesh.mesh import Mesh, hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
