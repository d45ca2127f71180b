"""Layer and engine numerics vs PyTorch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from semseg_tpu.engine.losses import cross_entropy_mean, cross_entropy_sum
from semseg_tpu.engine.optim import make_lr_mult, poly_lr, sgd_init, sgd_update
from semseg_tpu.engine.trainer import replica_mean_ce
from semseg_tpu.models.layers import BatchNorm
from semseg_tpu.utils.metrics import (
    intersection_and_union,
    intersection_and_union_jax,
)


# ---------------------------------------------------------------------------
# BatchNorm
# ---------------------------------------------------------------------------
def _torch_bn_step(x_nhwc, weight, bias, rmean, rvar, momentum=0.1, train=True):
    bn = torch.nn.BatchNorm2d(x_nhwc.shape[-1], momentum=momentum)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(weight))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(rmean))
        bn.running_var.copy_(torch.from_numpy(rvar))
    bn.train(train)
    with torch.no_grad():
        y = bn(torch.from_numpy(x_nhwc).permute(0, 3, 1, 2))
    return (
        y.permute(0, 2, 3, 1).numpy(),
        bn.running_mean.numpy(),
        bn.running_var.numpy(),
    )


@pytest.mark.parametrize("train", [True, False])
def test_batchnorm_matches_torch(rng, train):
    n, h, w, c = 4, 6, 5, 3
    x = rng.randn(n, h, w, c).astype(np.float32)
    weight = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32)
    rmean = rng.randn(c).astype(np.float32)
    rvar = rng.rand(c).astype(np.float32) + 0.5

    bn = BatchNorm()
    variables = {
        "params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(rmean), "var": jnp.asarray(rvar)},
    }
    y, mutated = bn.apply(
        variables, jnp.asarray(x), use_running_average=not train,
        mutable=["batch_stats"],
    )
    want_y, want_mean, want_var = _torch_bn_step(
        x, weight, bias, rmean, rvar, train=train
    )
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-4, atol=1e-4)
    if train:
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]), want_mean, rtol=1e-5, atol=1e-6
        )
        # torch stores the unbiased variance in running_var
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]), want_var, rtol=1e-5, atol=1e-6
        )


def test_syncbn_equals_big_batch_under_gspmd(rng):
    """A batch-sharded BatchNorm under jit must equal single-device
    big-batch BN — the TPU-native SyncBatchNorm guarantee."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semseg_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()  # 8 virtual CPU devices
    n, h, w, c = 16, 4, 4, 3
    x = rng.randn(n, h, w, c).astype(np.float32)
    bn = BatchNorm()
    variables = {
        "params": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)},
    }

    def fwd(v, xs):
        return bn.apply(v, xs, use_running_average=False, mutable=["batch_stats"])

    # Replicated single-device reference
    y_ref, stats_ref = jax.jit(fwd)(variables, jnp.asarray(x))

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    y_sharded, stats_sharded = jax.jit(fwd)(variables, xs)

    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_sharded["batch_stats"]["var"]),
        np.asarray(stats_ref["batch_stats"]["var"]),
        rtol=1e-5, atol=1e-6,
    )


def test_grouped_bn_matches_per_gpu_torch(rng):
    """groups=G (the `sync_bn: False` path) must equal torch BatchNorm2d
    run independently per group — the reference's per-GPU BN under DDP —
    with running stats tracking group 0 (DDP broadcast_buffers keeps rank
    0's buffers as the surviving estimate)."""
    n, h, w, c, g = 8, 5, 4, 3, 4
    x = rng.randn(n, h, w, c).astype(np.float32)
    weight = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32)
    rmean = rng.randn(c).astype(np.float32)
    rvar = rng.rand(c).astype(np.float32) + 0.5

    bn = BatchNorm(groups=g)
    variables = {
        "params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(rmean), "var": jnp.asarray(rvar)},
    }
    y, mutated = bn.apply(
        variables, jnp.asarray(x), use_running_average=False,
        mutable=["batch_stats"],
    )
    want = np.empty_like(x)
    per = n // g
    for gi in range(g):
        sl = slice(gi * per, (gi + 1) * per)
        want[sl], m0, v0 = _torch_bn_step(
            x[sl], weight, bias, rmean.copy(), rvar.copy(), train=True
        )
        if gi == 0:
            want_mean, want_var = m0, v0
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]), want_mean,
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]), want_var,
        rtol=1e-5, atol=1e-6,
    )
    # And it must actually differ from sync (global-batch) BN.
    y_sync, _ = BatchNorm().apply(
        variables, jnp.asarray(x), use_running_average=False,
        mutable=["batch_stats"],
    )
    assert np.abs(np.asarray(y_sync) - np.asarray(y)).max() > 1e-4


def test_grouped_bn_gspmd_sharded_matches_unsharded(rng):
    """Per-group BN under GSPMD batch sharding (one group per replica)
    equals the unsharded computation — sync off stays replica-local."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semseg_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()  # 8 virtual CPU devices
    n, h, w, c = 16, 4, 4, 3
    x = rng.randn(n, h, w, c).astype(np.float32)
    bn = BatchNorm(groups=8)
    variables = {
        "params": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)},
    }

    def fwd(v, xs):
        return bn.apply(v, xs, use_running_average=False, mutable=["batch_stats"])

    y_ref, stats_ref = jax.jit(fwd)(variables, jnp.asarray(x))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    y_sharded, stats_sharded = jax.jit(fwd)(variables, xs)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_sharded["batch_stats"]["mean"]),
        np.asarray(stats_ref["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6,
    )


@pytest.mark.slow
def test_sync_bn_config_switch(rng):
    """build_model honors `sync_bn`: False switches every BN in the model
    to per-replica-group moments (reference tool/train.py:141-142)."""
    from semseg_tpu.config import Config
    from semseg_tpu.models.build import build_model
    from semseg_tpu.models.layers import set_bn_groups

    base = dict(
        arch="psp", layers=50, classes=3, zoom_factor=8, train_h=33,
        train_w=33,
    )
    x = rng.randn(4, 33, 33, 3).astype(np.float32)
    try:
        outs = {}
        for sync in (True, False):
            model, _ = build_model(
                Config({**base, "sync_bn": sync}), data_shards=4
            )
            variables = jax.jit(
                lambda r, xs, m=model: m.init(
                    {"params": r, "dropout": r}, xs, train=True
                )
            )(jax.random.PRNGKey(0), jnp.asarray(x))
            (logits, _aux), _ = model.apply(
                variables, jnp.asarray(x), train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            outs[sync] = np.asarray(logits)
        assert np.abs(outs[True] - outs[False]).max() > 1e-5
    finally:
        set_bn_groups(1)  # don't leak the ambient override into other tests


# ---------------------------------------------------------------------------
# SGD
# ---------------------------------------------------------------------------
def test_sgd_matches_torch_multi_step(rng):
    p0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(3)]
    lr, mom, wd = 0.05, 0.9, 1e-4

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([pt], lr=lr, momentum=mom, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        opt.step()

    params = {"w": jnp.asarray(p0)}
    state = sgd_init(params)
    mult = {"w": 1.0}
    for g in grads:
        params, state = sgd_update(
            params, {"w": jnp.asarray(g)}, state, jnp.float32(lr), mult,
            momentum=mom, weight_decay=wd,
        )
    np.testing.assert_allclose(
        np.asarray(params["w"]), pt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_sgd_lr_multiplier_groups(rng):
    p0 = rng.randn(2, 2).astype(np.float32)
    g = rng.randn(2, 2).astype(np.float32)
    params = {"backbone": {"w": jnp.asarray(p0)}, "cls": {"w": jnp.asarray(p0)}}
    grads = {"backbone": {"w": jnp.asarray(g)}, "cls": {"w": jnp.asarray(g)}}
    mult = make_lr_mult(params)
    assert mult["backbone"]["w"] == 1.0 and mult["cls"]["w"] == 10.0
    new_params, _ = sgd_update(
        params, grads, sgd_init(params), jnp.float32(0.01), mult,
        momentum=0.0, weight_decay=0.0,
    )
    step_backbone = np.asarray(params["backbone"]["w"] - new_params["backbone"]["w"])
    step_cls = np.asarray(params["cls"]["w"] - new_params["cls"]["w"])
    np.testing.assert_allclose(
        step_cls, 10.0 * step_backbone, rtol=1e-4, atol=1e-7
    )


def test_poly_lr_schedule():
    got = poly_lr(0.01, jnp.int32(500), 1000, 0.9)
    want = 0.01 * (1 - 500 / 1000) ** 0.9
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("zoom", [1, 2, 4])
def test_downscale_labels_matches_torch(rng, zoom):
    """zoom_factor != 8 label downscale == the reference's
    F.interpolate(float labels, bilinear, align_corners=True).long()
    (reference tool/train.py:262-266), including ignore-label pixels."""
    from semseg_tpu.engine.trainer import downscale_labels

    labels = rng.randint(0, 5, size=(2, 25, 33)).astype(np.int64)
    labels[0, :4, :6] = 255
    got = np.asarray(downscale_labels(jnp.asarray(labels), zoom))
    h = (25 - 1) // 8 * zoom + 1
    w = (33 - 1) // 8 * zoom + 1
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(labels).unsqueeze(1).float(),
            size=(h, w), mode="bilinear", align_corners=True,
        ).squeeze(1).long().numpy()
    )
    np.testing.assert_array_equal(got, want)


def test_nll_per_pixel_matches_torch(rng):
    """Per-pixel NLL (logsumexp-dot form) == torch CE reduction='none',
    including gradient equality — guards the TPU-friendly reformulation
    against the gather-based definition it replaced."""
    from semseg_tpu.engine.losses import nll_and_valid

    logits = rng.randn(2, 7, 7, 5).astype(np.float32) * 4.0
    labels = rng.randint(0, 5, size=(2, 7, 7)).astype(np.int64)
    labels[0, :2, :3] = 255
    nll, valid = nll_and_valid(jnp.asarray(logits), jnp.asarray(labels), 255)
    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2).requires_grad_()
    want = F.cross_entropy(
        t_logits, torch.from_numpy(labels), ignore_index=255,
        reduction="none",
    )
    np.testing.assert_allclose(
        np.asarray(nll * valid), want.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(valid), labels != 255)

    want.sum().backward()
    got_grad = jax.grad(
        lambda lg: jnp.sum(nll_and_valid(lg, jnp.asarray(labels), 255)[0]
                           * (jnp.asarray(labels) != 255))
    )(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(got_grad),
        t_logits.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(2, 7, 7, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=(2, 7, 7)).astype(np.int64)
    labels[0, :2, :3] = 255
    got = float(cross_entropy_mean(jnp.asarray(logits), jnp.asarray(labels), 255))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels),
        ignore_index=255,
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_replica_mean_ce_matches_ddp_semantics(rng):
    logits = rng.randn(8, 5, 5, 4).astype(np.float32)
    labels = rng.randint(0, 4, size=(8, 5, 5)).astype(np.int64)
    labels[0] = 255  # replica 0, sample 0 heavily ignored -> unequal counts
    num_replicas = 4
    got = replica_mean_ce(
        jnp.asarray(logits), jnp.asarray(labels), num_replicas, 255
    )
    per_replica = []
    for r in range(num_replicas):
        sl = slice(r * 2, (r + 1) * 2)
        per_replica.append(
            F.cross_entropy(
                torch.from_numpy(logits[sl]).permute(0, 3, 1, 2),
                torch.from_numpy(labels[sl]),
                ignore_index=255,
            ).item()
        )
    np.testing.assert_allclose(float(got), np.mean(per_replica), rtol=1e-5)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------
def test_intersection_union_jax_matches_numpy(rng):
    k = 6
    output = rng.randint(0, k, size=(2, 9, 9))
    target = rng.randint(0, k, size=(2, 9, 9))
    target[0, :3] = 255
    i_np, u_np, t_np = intersection_and_union(output, target, k, 255)
    i_j, u_j, t_j = intersection_and_union_jax(
        jnp.asarray(output), jnp.asarray(target), k, 255
    )
    np.testing.assert_array_equal(np.asarray(i_j), i_np)
    np.testing.assert_array_equal(np.asarray(u_j), u_np)
    np.testing.assert_array_equal(np.asarray(t_j), t_np)
