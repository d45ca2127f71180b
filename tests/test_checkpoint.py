"""Checkpoint subsystem: save/restore round trip, rolling retention,
latest-checkpoint discovery, torch .pth conversion path."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from semseg_tpu.engine import checkpoint as ckpt
from semseg_tpu.engine.optim import SGDState
from semseg_tpu.engine.trainer import TrainState


def _state(seed=0):
    rs = np.random.RandomState(seed)
    params = {"backbone": {"w": jnp.asarray(rs.randn(3, 4).astype(np.float32))}}
    stats = {"backbone": {"bn": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}}
    return TrainState(
        params=params,
        batch_stats=stats,
        opt=SGDState(momentum={"backbone": {"w": jnp.zeros((3, 4))}}),
        step=jnp.asarray(7, jnp.int32),
    )


def test_save_restore_round_trip(tmp_path):
    state = _state()
    path = ckpt.save_checkpoint(str(tmp_path), 3, state)
    assert path.endswith("train_epoch_3.ckpt")
    payload = ckpt.restore_checkpoint(path)
    assert payload["epoch"] == 3
    assert int(payload["step"]) == 7
    np.testing.assert_array_equal(
        payload["params"]["backbone"]["w"],
        np.asarray(state.params["backbone"]["w"]),
    )
    np.testing.assert_array_equal(
        payload["momentum"]["backbone"]["w"], np.zeros((3, 4))
    )


def test_async_save_round_trip_and_donation_safety(tmp_path):
    """save_checkpoint_async snapshots on device before returning: even
    if the caller's buffers are then DONATED to a jit (as every train
    step does), the written checkpoint holds the pre-donation values."""
    import jax

    state = _state()
    orig = np.asarray(state.params["backbone"]["w"]).copy()
    path = ckpt.save_checkpoint_async(str(tmp_path), 3, state)
    # Donate the original param buffer while the save is in flight.
    donated = jax.jit(lambda x: x * 0.0, donate_argnums=0)(
        state.params["backbone"]["w"]
    )
    np.testing.assert_array_equal(np.asarray(donated), np.zeros((3, 4)))
    ckpt.wait_pending()
    payload = ckpt.restore_checkpoint(path)
    assert payload["epoch"] == 3 and int(payload["step"]) == 7
    np.testing.assert_array_equal(payload["params"]["backbone"]["w"], orig)


def test_async_save_error_surfaces_on_wait(tmp_path, monkeypatch):
    class Boom:
        def save(self, *a, **k):
            raise RuntimeError("disk full")

    monkeypatch.setattr(ckpt, "_checkpointer", lambda: Boom())
    ckpt.save_checkpoint_async(str(tmp_path), 1, _state())
    with pytest.raises(RuntimeError, match="disk full"):
        ckpt.wait_pending()
    ckpt.wait_pending()  # error consumed; subsequent waits are clean


def test_async_save_retention_matches_sync(tmp_path):
    state = _state()
    for epoch in range(1, 6):
        ckpt.save_checkpoint_async(
            str(tmp_path), epoch, state, save_freq=1, keep=2
        )
    ckpt.wait_pending()
    existing = sorted(os.listdir(tmp_path))
    assert existing == ["train_epoch_4.ckpt", "train_epoch_5.ckpt"]


def test_rolling_retention_keeps_two(tmp_path):
    state = _state()
    for epoch in range(1, 6):
        ckpt.save_checkpoint(str(tmp_path), epoch, state, save_freq=1, keep=2)
    existing = sorted(os.listdir(tmp_path))
    assert existing == ["train_epoch_4.ckpt", "train_epoch_5.ckpt"]


def test_latest_checkpoint_discovery(tmp_path):
    assert ckpt.latest_checkpoint(str(tmp_path)) is None
    state = _state()
    ckpt.save_checkpoint(str(tmp_path), 2, state, keep=10)
    ckpt.save_checkpoint(str(tmp_path), 10, state, keep=10)
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("train_epoch_10.ckpt")


def test_load_model_variables_native(tmp_path):
    state = _state()
    path = ckpt.save_checkpoint(str(tmp_path), 1, state)
    variables = ckpt.load_model_variables(path, "psp", 50)
    assert set(variables) == {"params", "batch_stats"}
    np.testing.assert_array_equal(
        variables["params"]["backbone"]["w"],
        np.asarray(state.params["backbone"]["w"]),
    )


@pytest.mark.slow
def test_load_model_variables_torch_pth(tmp_path):
    """A reference-style .pth (DDP-prefixed) converts on load."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from model.pspnet import PSPNet as TorchPSPNet

    torch.manual_seed(0)
    tm = TorchPSPNet(layers=50, classes=5, zoom_factor=8, pretrained=False)
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    path = str(tmp_path / "ref.pth")
    torch.save({"epoch": 1, "state_dict": sd}, path)

    variables = ckpt.load_model_variables(path, "psp", 50)
    assert "backbone" in variables["params"]
    assert "ppm" in variables["params"]
    # conv kernels transposed OIHW -> HWIO
    k = variables["params"]["backbone"]["stem_cb1"]["conv"]["kernel"]
    assert k.shape == (3, 3, 3, 64)


def test_mid_write_killed_save_falls_back(tmp_path):
    """Crash robustness: a process killed mid-save (dies inside the
    checkpoint write, before the completion marker lands) must not
    poison `resume: auto` — latest_checkpoint skips the unmarked
    directory and falls back to the previous complete checkpoint."""
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(
        f"""
        import os, sys
        sys.path.insert(0, {repo!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from semseg_tpu.engine import checkpoint as ckpt
        from semseg_tpu.engine.optim import SGDState
        from semseg_tpu.engine.trainer import TrainState

        state = TrainState(
            params={{"w": jnp.ones((2, 2))}},
            batch_stats={{}},
            opt=SGDState(momentum={{"w": jnp.zeros((2, 2))}}),
            step=jnp.asarray(3, jnp.int32),
        )
        ckpt.save_checkpoint({str(tmp_path)!r}, 1, state)
        real = ckpt._checkpointer

        class KilledMidWrite:
            def save(self, path, payload):
                real().save(path, payload)  # files land on disk...
                os._exit(9)  # ...but the process dies before the marker

        ckpt._checkpointer = lambda: KilledMidWrite()
        ckpt.save_checkpoint({str(tmp_path)!r}, 2, state)
        """
    )
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True)
    assert proc.returncode == 9, proc.stderr
    # Both directories exist on disk; only epoch 1 carries the marker.
    assert os.path.isdir(ckpt.checkpoint_path(str(tmp_path), 2))
    assert not ckpt.checkpoint_is_complete(
        ckpt.checkpoint_path(str(tmp_path), 2))
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("train_epoch_1.ckpt")
    payload = ckpt.restore_checkpoint(latest)
    assert payload["epoch"] == 1 and int(payload["step"]) == 3


def test_incomplete_preempt_snapshot_falls_back(tmp_path):
    """A preemption snapshot killed mid-write loses its priority over
    epoch saves; all-markerless directories (written by older versions)
    still resolve to the newest, as before."""
    state = _state()
    ckpt.save_checkpoint(str(tmp_path), 4, state)
    # Craft a markerless (killed) preempt snapshot next to it.
    ppath = ckpt.preempt_checkpoint_path(str(tmp_path))
    os.makedirs(ppath)
    with open(os.path.join(ppath, "partial"), "w") as f:
        f.write("x")
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("train_epoch_4.ckpt")
    # Legacy behavior: no marker anywhere -> newest candidate wins.
    os.remove(os.path.join(
        ckpt.checkpoint_path(str(tmp_path), 4), ckpt._COMPLETE_MARKER))
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest == ppath
