"""Device mesh + sharding helpers.

The communication "backend": where the reference stitches together NCCL
process groups, DistributedSampler, DDP gradient buckets and explicit
``dist.all_reduce`` calls (``tool/train.py:103-119,157,279-290``), the
TPU-native design is one ``jax.sharding.Mesh`` over all chips with XLA
compiling every collective (gradient pmean, SyncBN moment pmean, metric
psum) onto ICI. Multi-host setups only need ``jax.distributed.initialize``
before mesh creation; data loading shards per host via the loader.

The mesh is 2D ``(data, model)``: data-parallel replication along ``data``
(the reference's only strategy) plus a ``model`` axis reserved for tensor
sharding of the wide head convs; ``model=1`` keeps pure DP.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int | None = None, model: int = 1) -> Mesh:
    """Mesh over all available devices, data-parallel major."""
    n = jax.device_count()
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    devices = mesh_utils.create_device_mesh((data, model))
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host numpy arrays sharded along the batch axis."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]
