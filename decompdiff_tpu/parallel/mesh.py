"""Device mesh and sharding layout.

The reference is strictly single-GPU (SURVEY.md §2.10: no DDP/NCCL/MPI
anywhere); scaling here is introduced TPU-natively:

  * **Data parallelism (dp)** over the ICI mesh: the complex batch shards on
    its leading axis, parameters are replicated, and XLA inserts the gradient
    all-reduce (psum over 'dp') automatically from the shardings. This is the
    only parallelism the workload justifies.
  * **TP/PP/SP/EP are structurally unjustified** for this model family and are
    deliberately not implemented: the denoiser is ~5M params (hidden 128,
    6 layers — fits in a fraction of one core's VMEM), the "sequence" is a
    single complex's atom set (~400 nodes, kNN-sparse attention), and there
    are no experts. Sharding atoms across chips would put every kNN gather and
    segment softmax on the ICI for a model that is thousands of times smaller
    than the per-chip HBM. Batch sharding is strictly better at every scale;
    sampling is embarrassingly parallel across pockets.

Multi-host: the same code runs under jax.distributed with a DCN-connected
mesh; 'dp' spans all slices (gradient allreduce rides ICI within a slice and
DCN across, handled by XLA's hierarchical collectives).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = 'dp') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'dp') -> NamedSharding:
    """Shard the leading (complex) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = 'dp'):
    """Place every array of a ComplexBatch pytree with its leading axis sharded
    over the mesh's data axis."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
