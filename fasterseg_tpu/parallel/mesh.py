"""Device mesh + sharding helpers — the framework's communication backend.

The reference is single-GPU; its dead torch.distributed helpers
(tools/utils/pyt_utils.py:23-37) and multiprocess eval queue
(tools/engine/evaluator.py:128-157) are replaced here by SPMD over a
`jax.sharding.Mesh` (SURVEY.md §5.8):

* data axis  — batch parallelism for pretrain/search/train steps; XLA
  inserts gradient all-reduces over ICI automatically when params are
  replicated and the batch is sharded. BatchNorm statistics become global
  (sync-BN) for free because the mean/variance reductions cross the
  sharded batch axis.
* spatial axis — optional H-partitioning for full-resolution (1024x2048)
  eval/inference, the CNN analog of context parallelism (SURVEY.md §5.7);
  XLA handles 3x3-conv halo exchange for sharded spatial dims.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Create a mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = SPATIAL_AXIS) -> NamedSharding:
    """Shard NHWC height — full-res inference across chips."""
    return NamedSharding(mesh, P(None, axis))


def shard_batch(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a host batch with the leading dim sharded over `axis`."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
