"""Device mesh construction and sharding helpers."""

from semseg_tpu.parallel.mesh import create_mesh, shard_batch

__all__ = ["create_mesh", "shard_batch"]
