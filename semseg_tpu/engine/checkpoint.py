"""Checkpoint save/resume.

Capability-parity with the reference (``tool/train.py:161-186,231-237``):
- per-epoch checkpoints ``train_epoch_<N>.ckpt`` holding
  {params, batch_stats, optimizer momentum, step, epoch};
- rolling retention of the two most recent (older epochs deleted);
- ``weight:`` load path (params/batch_stats only, for fine-tuning);
- ``resume:`` path restoring epoch/model/optimizer;
- reference ``.pth`` torch checkpoints are converted transparently
  (``tool/test.py:112-113`` strict=False analog: the aux head may be
  missing — conversion only fills what exists).

Storage is orbax (async-capable, multi-host safe); auto-resume after a
crash is ``latest_checkpoint(save_path)`` + ``load_resume`` — the
fault-tolerance story for preemptible TPU jobs.
"""

from __future__ import annotations

import os
import re
import shutil
import threading
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        # Saves here are rank-0-only with a host-local numpy payload
        # (reference semantics, tool/train.py:231-234). orbax's default
        # Checkpointer barriers across ALL processes inside save() — a
        # deadlock when the other ranks never call it. Restrict its
        # coordination to the calling process; the payload is already
        # device_get numpy, so no cross-host shards are involved.
        me = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me},
            ),
        )
    return ocp.PyTreeCheckpointer()


def checkpoint_path(save_path: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(save_path), f"train_epoch_{epoch}.ckpt")


# Completion marker: written inside the checkpoint directory strictly
# after the orbax write returns, so a save killed mid-write (power loss,
# preemption landing inside the serializer) is distinguishable from a
# finished one. `resume: auto` skips unmarked directories and falls back
# to the newest marked checkpoint instead of dying on a partial restore.
_COMPLETE_MARKER = ".semseg_complete"


def _mark_complete(path: str) -> None:
    with open(os.path.join(path, _COMPLETE_MARKER), "w") as f:
        f.write("ok\n")


def checkpoint_is_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, _COMPLETE_MARKER))


def save_checkpoint(save_path: str, epoch: int, state, save_freq: int = 1,
                    keep: int = 2) -> str:
    """Save state at ``epoch`` (1-based, like the reference) and prune."""
    path = checkpoint_path(save_path, epoch)
    payload = {
        "epoch": epoch,
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "momentum": jax.device_get(state.opt.momentum),
    }
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, payload)
    _mark_complete(path)
    old = epoch - save_freq * keep
    old_path = checkpoint_path(save_path, old)
    if old > 0 and os.path.exists(old_path):
        shutil.rmtree(old_path)
    # An end-of-epoch save supersedes any mid-epoch preemption snapshot.
    preempt = preempt_checkpoint_path(save_path)
    if os.path.exists(preempt):
        shutil.rmtree(preempt)
    return path


# ---------------------------------------------------------------------------
# Async saving: overlap device->host transfer + orbax write with training.
#
# The torch reference (and our sync save_checkpoint) blocks the train loop
# for the whole save. Here save_checkpoint_async first snapshots the state
# with an on-device copy — O(HBM-bandwidth), microseconds-cheap and safe
# against the train step's buffer donation invalidating the originals —
# then a worker thread performs the device_get and the orbax write while
# training continues. wait_pending() joins the in-flight save (called
# automatically before the next save; the driver also joins before
# preemption snapshots and at run end) and re-raises any worker error.
#
# Multi-host runs fall back to the synchronous path: the on-device
# jax.numpy.copy is an eager op, and on state replicated over a global
# mesh with non-addressable devices eager ops raise (jax.device_get of
# fully-replicated arrays, which the sync path uses, is fine).
# ---------------------------------------------------------------------------


class AsyncSaver:
    """One in-flight async checkpoint save. Instances are independent, so
    concurrent trainers can each own a saver without sharing state."""

    def __init__(self):
        self._pending: Optional[threading.Thread] = None
        self._error: list = []

    def wait_pending(self) -> None:
        """Join the in-flight save, re-raising its error if it failed."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._error:
            raise self._error.pop()

    def save_async(self, save_path: str, epoch: int, state,
                   save_freq: int = 1, keep: int = 2) -> str:
        """Like save_checkpoint, but returns as soon as the state is
        snapshotted on device; transfer + write happen on a worker
        thread. Multi-host processes take the sync path (see above)."""
        self.wait_pending()
        if jax.process_count() > 1:
            return save_checkpoint(save_path, epoch, state, save_freq, keep)
        snap_step = np.asarray(state.step)
        snap = jax.tree.map(
            jax.numpy.copy,
            {"params": state.params, "batch_stats": state.batch_stats,
             "momentum": state.opt.momentum},
        )
        path = checkpoint_path(save_path, epoch)
        error = self._error

        def worker():
            try:
                payload = {
                    "epoch": epoch,
                    "step": snap_step,
                    "params": jax.device_get(snap["params"]),
                    "batch_stats": jax.device_get(snap["batch_stats"]),
                    "momentum": jax.device_get(snap["momentum"]),
                }
                if os.path.exists(path):
                    shutil.rmtree(path)
                _checkpointer().save(path, payload)
                _mark_complete(path)
                old = epoch - save_freq * keep
                old_path = checkpoint_path(save_path, old)
                if old > 0 and os.path.exists(old_path):
                    shutil.rmtree(old_path)
                preempt = preempt_checkpoint_path(save_path)
                if os.path.exists(preempt):
                    shutil.rmtree(preempt)
            except BaseException as exc:  # surfaced by wait_pending()
                error.append(exc)

        self._pending = threading.Thread(target=worker, daemon=True)
        self._pending.start()
        return path


_default_saver = AsyncSaver()


def wait_pending() -> None:
    """Join the default saver's in-flight save (module-level API)."""
    _default_saver.wait_pending()


def save_checkpoint_async(save_path: str, epoch: int, state,
                          save_freq: int = 1, keep: int = 2) -> str:
    return _default_saver.save_async(save_path, epoch, state, save_freq, keep)


def preempt_checkpoint_path(save_path: str) -> str:
    return os.path.join(os.path.abspath(save_path), "train_preempt.ckpt")


def save_preempt_checkpoint(save_path: str, epoch: int, state) -> str:
    """Mid-epoch snapshot on preemption (SIGTERM).

    ``epoch`` is the 0-based in-progress epoch (== count of completed
    epochs), matching the resume convention: the global ``step`` encodes
    how many batches of that epoch were consumed, so resume fast-forwards
    the loader to ``step - epoch * steps_per_epoch``. Fault-tolerance
    upgrade over the reference, whose only recovery is re-launching from
    the last *epoch* checkpoint (``tool/train.py:173-186``).
    """
    path = preempt_checkpoint_path(save_path)
    payload = {
        "epoch": epoch,
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "momentum": jax.device_get(state.opt.momentum),
    }
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, payload)
    _mark_complete(path)
    return path


def latest_checkpoint(save_path: str) -> Optional[str]:
    """Newest *complete* checkpoint in ``save_path`` (see _COMPLETE_MARKER).

    Ordering: a preemption snapshot outranks any epoch save (end-of-epoch
    saves delete it), then higher epochs. Directories without the
    completion marker are skipped with a warning — a save killed
    mid-write must not become the auto-resume source. If no directory
    carries a marker at all (checkpoints written by older versions), the
    newest is returned as before, with a warning.
    """
    if not os.path.isdir(save_path):
        return None
    candidates = []  # (is_preempt, epoch, path) — sort key, newest first
    preempt = preempt_checkpoint_path(save_path)
    if os.path.exists(preempt):
        candidates.append((1, 0, preempt))
    for name in os.listdir(save_path):
        m = re.fullmatch(r"train_epoch_(\d+)\.ckpt", name)
        if m:
            candidates.append((0, int(m.group(1)),
                               os.path.join(save_path, name)))
    candidates.sort(reverse=True)
    if not candidates:
        return None
    import logging

    log = logging.getLogger(__name__)
    complete = [p for *_, p in candidates if checkpoint_is_complete(p)]
    if complete:
        skipped = []
        for *_, p in candidates:
            if p == complete[0]:
                break
            skipped.append(p)
        if skipped:
            log.warning(
                "skipping incomplete checkpoint(s) %s (no completion "
                "marker — killed mid-write?); resuming from %s",
                skipped, complete[0],
            )
        return complete[0]
    log.warning(
        "no checkpoint in %s carries a completion marker (written by an "
        "older version, or all saves were interrupted); using newest %s",
        save_path, candidates[0][2],
    )
    return candidates[0][2]


def restore_checkpoint(path: str) -> dict:
    return _checkpointer().restore(os.path.abspath(path))


def load_pretrained_backbone(state, layers: int, path: str):
    """Overlay ImageNet-pretrained deep-base ResNet weights onto the
    backbone subtree of a fresh TrainState.

    Mirrors the reference default of building seg models with
    ``pretrained=True`` (``model/resnet.py:199-200`` loads
    ``initmodel/resnet{50,101,152}_v2.pth`` with strict=False inside the
    constructor; ``tool/train.py:121-126`` relies on it). Only keys that
    exist in the fresh backbone are overlaid, so the classifier ``fc`` of
    the ImageNet checkpoint is ignored, like strict=False.

    Returns (new_state, unused_torch_keys).
    """
    from semseg_tpu.models.convert import (
        convert_imagenet_resnet,
        load_torch_checkpoint,
    )

    variables, unused = convert_imagenet_resnet(load_torch_checkpoint(path), layers)

    def overlay(base, new):
        if not isinstance(base, dict):
            return np.asarray(new, dtype=np.float32) if new is not None else base
        return {
            k: overlay(v, new.get(k)) if isinstance(new, dict) and k in new else v
            for k, v in base.items()
        }

    params = dict(state.params)
    params["backbone"] = overlay(
        state.params["backbone"], variables["params"].get("backbone", {})
    )
    batch_stats = dict(state.batch_stats)
    if "backbone" in batch_stats:
        batch_stats["backbone"] = overlay(
            state.batch_stats["backbone"],
            variables["batch_stats"].get("backbone", {}),
        )
    new_state = state._replace(
        params=jax.tree.map(np.asarray, params),
        batch_stats=jax.tree.map(np.asarray, batch_stats),
    )
    return new_state, [k for k in unused if not k.startswith("fc.")]


def export_pth(ckpt_path: str, out_path: str, arch: str, layers: int) -> str:
    """Export a native checkpoint directory to a reference-consumable
    torch ``.pth`` (inverse of the ``.pth`` load path; the reference test
    driver loads it directly, ``tool/test.py:107-116``)."""
    from semseg_tpu.models.convert import export_pth as _export

    payload = restore_checkpoint(ckpt_path)
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    return _export(out_path, variables, arch, layers,
                   epoch=int(payload.get("epoch", 0)))


def load_model_variables(path: str, arch: str, layers: int) -> dict:
    """Load eval variables {'params', 'batch_stats'} from either a native
    checkpoint directory or a reference torch ``.pth`` file."""
    if path.endswith(".pth"):
        from semseg_tpu.models.convert import (
            convert_torch_state_dict,
            load_torch_checkpoint,
        )

        variables, unused = convert_torch_state_dict(
            load_torch_checkpoint(path), arch, layers
        )
        if unused:
            import logging

            logging.getLogger(__name__).warning(
                "unconverted torch keys: %s", unused
            )
        return variables
    payload = restore_checkpoint(path)
    return {"params": payload["params"], "batch_stats": payload["batch_stats"]}
