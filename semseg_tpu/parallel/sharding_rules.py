"""Tensor-parallel sharding rules for the segmentation heads.

The backbone is replicated (its convs are small relative to ICI cost),
while the wide post-backbone layers — PPM/PSA reduce convs (2048->512),
the 4096->512 classifier neck, the PSA attention projections — shard
their output channels across the ``model`` mesh axis. Under GSPMD this is
purely declarative: parameters are placed with these PartitionSpecs and
XLA partitions the convolutions and inserts the (all-gather/reduce)
collectives where layouts meet.

BatchNorm parameters and running statistics of a channel-sharded conv
shard along the same axis, so cross-replica BN stays exact: moments are
computed per channel shard over the (globally sharded) batch.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from semseg_tpu.parallel.mesh import MODEL_AXIS

# Top-level param groups eligible for TP (the reference's "new modules").
_TP_MODULES = ("ppm", "cls", "aux", "psa")
_MIN_SHARD_CHANNELS = 256


def _path_keys(path):
    return [p.key for p in path if hasattr(p, "key")]


def tp_spec_for_leaf(path, leaf) -> P:
    """PartitionSpec for one parameter/statistic leaf."""
    keys = _path_keys(path)
    if not keys or keys[0] not in _TP_MODULES:
        return P()
    last = keys[-1]
    # Final logit convs stay replicated: the class dim is small and the
    # contraction over the sharded 512 input is left to the partitioner.
    if "conv_logits" in keys:
        return P()
    if last == "kernel" and leaf.ndim == 4 and leaf.shape[-1] >= _MIN_SHARD_CHANNELS:
        return P(None, None, None, MODEL_AXIS)
    if last in ("scale", "bias", "mean", "var") and leaf.ndim == 1 \
            and leaf.shape[0] >= _MIN_SHARD_CHANNELS:
        return P(MODEL_AXIS)
    return P()


def shard_train_state(state, mesh):
    """Place a TrainState on ``mesh`` with TP head sharding.

    params / batch_stats / optimizer momentum follow the same rules;
    scalars replicate. With ``model=1`` meshes this is plain replication.
    """

    def put(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        leaves, treedef = flat[0], flat[1]
        placed = [
            jax.device_put(leaf, NamedSharding(mesh, tp_spec_for_leaf(path, leaf)))
            for path, leaf in leaves
        ]
        return jax.tree_util.tree_unflatten(treedef, placed)

    replicated = NamedSharding(mesh, P())
    return type(state)(
        params=put(state.params),
        batch_stats=put(state.batch_stats),
        opt=type(state.opt)(momentum=put(state.opt.momentum)),
        step=jax.device_put(state.step, replicated),
    )
