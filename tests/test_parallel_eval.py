"""Multi-chip SPMD eval: the evaluator's jitted scale programs over a
device mesh must produce exactly what the single-device programs produce.

Reference analog: ``tool/test.py:34-36`` wraps the model in
``DataParallel`` and additionally shards image indices across processes.
Here one process drives all chips through GSPMD: ``partition='window'``
shards the sliding-grid window batch over the ``data`` axis,
``partition='spatial'`` shards each window's H axis (XLA inserts conv
halo exchanges) — the latter has no reference counterpart (a GPU
DataParallel cannot split one convolution).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from semseg_tpu.parallel.mesh import DATA_AXIS

from tests.test_integration import _PerPixelModel


def _mesh(n=8):
    devices = np.asarray(jax.devices()[:n])
    return Mesh(devices, (DATA_AXIS,))


def _kwargs():
    return dict(
        classes=2, crop_h=17, crop_w=17, mean=[10.0, 20.0, 30.0],
        std=[55.0, 55.0, 55.0], base_size=52,
        scales=[0.75, 1.0, 1.25], flip=True, window_batch=8,
    )


@pytest.mark.parametrize("partition", ["window", "spatial"])
def test_mesh_eval_matches_single_device(partition):
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

    rs = np.random.RandomState(4)
    image = (rs.rand(37, 52, 3) * 255).astype(np.float32)
    single = SlidingWindowEvaluator(
        _PerPixelModel(2.0), {}, mode="device", **_kwargs()
    )
    meshed = SlidingWindowEvaluator(
        _PerPixelModel(2.0), {}, mode="device",
        mesh=_mesh(), partition=partition, **_kwargs()
    )
    p_single = single.predict_probs(image)
    p_mesh = meshed.predict_probs(image)
    np.testing.assert_allclose(p_mesh, p_single, rtol=1e-6, atol=1e-6)
    # ms fused single-dispatch path under the mesh
    np.testing.assert_array_equal(
        np.asarray(meshed.predict_async(image)),
        np.asarray(single.predict_async(image)),
    )


class _ConvModel:
    """3x3-conv 'model' with fixed weights: spatial partitioning must
    halo-exchange rows between shards to reproduce it exactly."""

    def apply(self, variables, x, train=False):
        k = variables["kernel"]  # [3, 3, 3, 2]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # A global reduce on top (PPM-style context): under spatial
        # sharding this lowers to a cross-shard collective.
        return y + jnp.mean(y, axis=(1, 2), keepdims=True)


@pytest.mark.parametrize("partition", ["window", "spatial"])
def test_mesh_eval_conv_halo_exchange(partition):
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

    rs = np.random.RandomState(5)
    variables = {"kernel": jnp.asarray(rs.randn(3, 3, 3, 2), jnp.float32)}
    image = (rs.rand(40, 61, 3) * 255).astype(np.float32)
    kwargs = _kwargs()
    kwargs["base_size"] = 61
    single = SlidingWindowEvaluator(
        _ConvModel(), variables, mode="device", **kwargs
    )
    meshed = SlidingWindowEvaluator(
        _ConvModel(), variables, mode="device",
        mesh=_mesh(), partition=partition, **kwargs
    )
    np.testing.assert_allclose(
        meshed.predict_probs(image), single.predict_probs(image),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("partition", ["window", "spatial"])
def test_mesh_eval_bucketed_matches_single_device(partition):
    """The variable-shape (ADE20K/VOC) bucketed pipeline honors the mesh
    the same way the exact-shape pipeline does."""
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

    rs = np.random.RandomState(7)
    variables = {"kernel": jnp.asarray(rs.randn(3, 3, 3, 2), jnp.float32)}
    kwargs = _kwargs()
    kwargs["scales"] = [0.75, 1.0]
    kwargs["base_size"] = 48
    single = SlidingWindowEvaluator(
        _ConvModel(), variables, mode="device_bucketed", bucket=32, **kwargs
    )
    meshed = SlidingWindowEvaluator(
        _ConvModel(), variables, mode="device_bucketed", bucket=32,
        mesh=_mesh(), partition=partition, **kwargs
    )
    for shape in [(37, 52), (41, 33)]:
        image = (rs.rand(*shape, 3) * 255).astype(np.float32)
        np.testing.assert_allclose(
            meshed.predict_probs(image), single.predict_probs(image),
            rtol=1e-5, atol=1e-6, err_msg=f"shape {shape}",
        )


@pytest.mark.slow
@pytest.mark.parametrize("partition", ["window", "spatial"])
def test_mesh_eval_pspnet(partition):
    """Full PSPNet under the mesh: BN inference stats, the PPM's global
    and strided poolings, and the align-corners logit resize all run
    SPMD-partitioned; result must match the single-device program."""
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
    from semseg_tpu.models import PSPNet

    model = PSPNet(layers=50, classes=5, zoom_factor=8, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=False)
    )(rng, sample)

    rs = np.random.RandomState(6)
    image = (rs.rand(47, 65, 3) * 255).astype(np.float32)
    kwargs = dict(
        classes=5, crop_h=33, crop_w=33, mean=[124.0, 117.0, 104.0],
        std=[59.0, 57.0, 58.0], base_size=65, scales=[1.0], flip=True,
        window_batch=8,
    )
    single = SlidingWindowEvaluator(
        model, variables, mode="device", **kwargs
    )
    meshed = SlidingWindowEvaluator(
        model, variables, mode="device",
        mesh=_mesh(), partition=partition, **kwargs
    )
    p_single = single.predict_probs(image)
    p_mesh = meshed.predict_probs(image)
    # GSPMD reduction-order noise floor (same tolerance class as the
    # DPxTP train-step equivalence test).
    np.testing.assert_allclose(p_mesh, p_single, rtol=1e-5, atol=1e-5)
    agree = (np.argmax(p_mesh, -1) == np.argmax(p_single, -1)).mean()
    assert agree > 0.999, agree
