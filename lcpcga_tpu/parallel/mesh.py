"""Device mesh + sharding helpers.

The reference is a single-GPU program with no distributed machinery at
all (SURVEY.md §2.3); parallelism here is a first-class framework
feature. The natural unit of data parallelism is the batch item (a
training cube, /root/reference/data/dataloader.py:206-238, or an
evaluation frame): every sparse op is a vmap over the leading batch
axis, so sharding axis 0 over a mesh makes XLA insert exactly one
gradient all-reduce per step over ICI.

Multi-host pods extend the same mesh over DCN via jax.distributed —
the sharding annotations are unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for padded sparse batch arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of [B, ...] arrays batch-sharded on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
