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


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host (pod / DCN) job via ``jax.distributed``.

    Arguments default to the standard launcher environment
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``; on Cloud TPU pods ``initialize()`` auto-detects
    all three). After this returns, ``jax.devices()`` spans the whole
    job and :func:`data_parallel_mesh` builds the global mesh — the
    sharding annotations in ``parallel/train_step.py`` are unchanged,
    XLA routes the gradient all-reduce over ICI within a host group and
    DCN across them. Returns this host's process index. Idempotent:
    re-initialisation errors are swallowed so trainers can call it
    unconditionally.
    """
    import os

    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    n = num_processes if num_processes is not None else os.environ.get(
        "JAX_NUM_PROCESSES")
    if n is not None:
        kw["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is None:
        jax.distributed.initialize(**kw)
    return jax.process_index()


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
