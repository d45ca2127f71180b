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


@pytest.mark.slow
def test_tp_step_matches_unsharded_step(rng):
    """One full PSPNet50 train step on a (4, 2) DPxTP mesh equals the same
    step computed unsharded on one device: GSPMD partitioning (batch on
    `data`, head channels on `model`) must be a pure layout choice with no
    numeric effect beyond f32 reduction-order noise."""
    import jax.numpy as jnp

    from semseg_tpu.engine.trainer import create_train_state, make_train_step
    from semseg_tpu.models import PSPNet

    model = PSPNet(layers=50, classes=5, zoom_factor=8)
    batch, crop, classes = 8, 25, 5
    images = rng.rand(batch, crop, crop, 3).astype(np.float32)
    labels = rng.randint(0, classes, size=(batch, crop, crop)).astype(np.int32)
    labels[0, :5] = 255

    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((batch, crop, crop, 3))
    )
    step = make_train_step(
        model, classes=classes, ignore_label=255, aux_weight=0.4,
        base_lr=0.01, max_iter=100, power=0.9, momentum=0.9,
        weight_decay=1e-4, zoom_factor=8, num_replicas=4, donate=False,
    )

    # Unsharded single-computation reference
    ref_state, ref_metrics = step(
        state, jnp.asarray(images), jnp.asarray(labels)
    )

    # (4, 2) mesh: batch sharded on data, TP head sharding
    mesh = create_mesh(data=4, model=2)
    sharded = shard_train_state(state, mesh)
    gi = shard_batch(mesh, images)
    gl = shard_batch(mesh, labels)
    tp_state, tp_metrics = step(sharded, gi, gl)

    np.testing.assert_allclose(
        float(tp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    # Metric histograms: integer counts over 5000 pixels; logit noise at
    # near-tie argmaxes may flip isolated pixels, so allow a few counts —
    # any semantic divergence (wrong sharding, dropped pixels) would move
    # hundreds.
    for key in ("intersection", "union", "target"):
        np.testing.assert_allclose(
            np.asarray(tp_metrics[key]), np.asarray(ref_metrics[key]),
            rtol=0, atol=3, err_msg=key,
        )
    # Sharded-vs-unsharded compilation reorders f32 conv reductions (and
    # the backend picks per-shape algorithms), compounding through 50
    # layers of backward: measured deviation after one lr=0.01 step is
    # ~1.3e-3 max on params and ~4.4e-4 on BN stats for PURE DP (8,1) as
    # well — the GSPMD noise floor, not a TP effect. TP must stay at it.
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(tp_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=5e-3
        )
    for a, b in zip(
        jax.tree.leaves(ref_state.batch_stats),
        jax.tree.leaves(tp_state.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=2e-3
        )
