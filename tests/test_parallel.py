"""Parallelism: mesh construction, TP sharding rules, sharded placement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from semseg_tpu.parallel.mesh import create_mesh, shard_batch
from semseg_tpu.parallel.sharding_rules import shard_train_state, tp_spec_for_leaf


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (8, 1)
    mesh2 = create_mesh(model=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        create_mesh(model=3)


def test_shard_batch_places_on_data_axis(rng):
    mesh = create_mesh()
    x = rng.rand(16, 4, 4, 3).astype(np.float32)
    gx = shard_batch(mesh, x)
    spec = gx.sharding.spec
    assert spec == P("data")
    np.testing.assert_array_equal(np.asarray(gx), x)


def _key(name):
    return jax.tree_util.DictKey(name)


def test_tp_specs_shard_wide_head_channels():
    # wide head conv -> out-channel sharded
    leaf = jnp.zeros((1, 1, 2048, 512))
    assert tp_spec_for_leaf((_key("ppm"), _key("branch0"), _key("conv"),
                             _key("kernel")), leaf) == P(None, None, None, "model")
    # backbone stays replicated
    assert tp_spec_for_leaf((_key("backbone"), _key("layer1_block0"),
                             _key("cb1"), _key("conv"), _key("kernel")),
                            leaf) == P()
    # logit conv replicated (small class dim)
    small = jnp.zeros((1, 1, 512, 19))
    assert tp_spec_for_leaf((_key("cls"), _key("conv_logits"),
                             _key("kernel")), small) == P()
    # BN params of a sharded conv shard along channels
    bn = jnp.zeros((512,))
    assert tp_spec_for_leaf((_key("cls"), _key("cb"), _key("bn"),
                             _key("scale")), bn) == P("model")
    # narrow vectors replicated
    narrow = jnp.zeros((19,))
    assert tp_spec_for_leaf((_key("cls"), _key("conv_logits"),
                             _key("bias")), narrow) == P()


def test_shard_train_state_places_and_preserves(rng):
    from semseg_tpu.engine.optim import SGDState
    from semseg_tpu.engine.trainer import TrainState

    mesh = create_mesh(model=2)
    params = {
        "backbone": {"w": jnp.asarray(rng.rand(4, 4).astype(np.float32))},
        "cls": {"cb": {"conv": {"kernel": jnp.asarray(
            rng.rand(1, 1, 8, 512).astype(np.float32))}}},
    }
    state = TrainState(
        params=params,
        batch_stats={},
        opt=SGDState(momentum=jax.tree.map(jnp.zeros_like, params)),
        step=jnp.zeros((), jnp.int32),
    )
    sharded = shard_train_state(state, mesh)
    kernel = sharded.params["cls"]["cb"]["conv"]["kernel"]
    assert kernel.sharding.spec == P(None, None, None, "model")
    assert sharded.params["backbone"]["w"].sharding.spec == P()
    # momentum mirrors params
    assert (sharded.opt.momentum["cls"]["cb"]["conv"]["kernel"]
            .sharding.spec) == P(None, None, None, "model")
    np.testing.assert_array_equal(
        np.asarray(kernel), np.asarray(params["cls"]["cb"]["conv"]["kernel"])
    )
