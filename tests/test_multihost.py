"""Multi-host execution path: 2-process jax.distributed on CPU.

Covers what the reference exercises through NCCL TCP rendezvous +
DistributedSampler (reference ``tool/train.py:103-119,204-207``): process
rendezvous, per-host loader index sharding (``EpochSampler``), global
array assembly from process-local batches
(``jax.make_array_from_process_local_data``, the driver's multi-host
``to_global``), and a cross-host global reduction (the SyncBN/metric
collective pattern).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        # 2 procs x 2 virtual devices on one physical core: outlast XLA's
        # 40 s collective rendezvous kill-switch (see tests/conftest.py).
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    )
    sys.path.insert(0, os.environ["SEMSEG_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semseg_tpu.data.loader import EpochSampler
    from semseg_tpu.parallel.mesh import batch_sharding, create_mesh

    assert jax.device_count() == 4, jax.device_count()
    assert jax.process_count() == 2
    mesh = create_mesh()  # (data=4, model=1) across both processes
    assert mesh.devices.shape == (4, 1)

    # Per-host loader sharding: both hosts see disjoint halves of one
    # globally shuffled permutation (DistributedSampler semantics).
    sampler = EpochSampler(8, shuffle=True, seed=0, shard_index=pid,
                           num_shards=2)
    sampler.set_epoch(3)
    idx = sampler.indices()
    assert len(idx) == 4

    full = (np.arange(8, dtype=np.float32)[:, None]
            * np.ones((1, 3), np.float32))
    local = full[idx]  # this host's local batch
    sharding = batch_sharding(mesh)
    g = jax.make_array_from_process_local_data(sharding, local)
    assert g.shape == (8, 3)

    # Cross-host global reduction (the SyncBN moment / metric psum
    # pattern): the jitted global mean over the sharded batch must equal
    # the mean over all 8 samples regardless of the shard split.
    mean = jax.jit(lambda x: jnp.mean(x),
                   out_shardings=NamedSharding(mesh, P()))(g)
    np.testing.assert_allclose(np.asarray(mean), full.mean(), rtol=1e-6)

    # Coordinated preemption: only process 1 sees a local signal, at loop
    # step 2 — both processes must agree and stop at the SAME step
    # (per-host breaking would deadlock the next step's collectives).
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "tool_train", os.path.join(os.environ["SEMSEG_REPO"], "tool", "train.py")
    )
    train_tool = ilu.module_from_spec(spec)
    spec.loader.exec_module(train_tool)
    stopped_at = None
    for step in range(5):
        flag_local = (pid == 1 and step >= 2)
        if train_tool._preempt_agreed(flag_local):
            stopped_at = step
            break
    assert stopped_at == 2, stopped_at

    # Async epoch save under multi-host: state lives as global arrays
    # replicated over a mesh with non-addressable devices. The async
    # saver must fall back to the sync path (eager on-device copies of
    # such arrays raise) and still produce a loadable checkpoint.
    from semseg_tpu.engine import checkpoint as ckpt
    from semseg_tpu.engine.optim import SGDState
    from semseg_tpu.engine.trainer import TrainState
    rep = NamedSharding(mesh, P())
    w = jax.make_array_from_process_local_data(
        rep, np.arange(6, dtype=np.float32).reshape(2, 3)
    )
    mom = jax.make_array_from_process_local_data(
        rep, np.zeros((2, 3), np.float32)
    )
    state = TrainState(
        params={"backbone": {"w": w}},
        batch_stats={},
        opt=SGDState(momentum={"backbone": {"w": mom}}),
        step=jnp.asarray(7, jnp.int32),
    )
    save_dir = os.path.join(os.environ["SEMSEG_TMP"], "mh_ckpt")
    if pid == 0:
        path = ckpt.save_checkpoint_async(save_dir, 1, state)
        ckpt.wait_pending()
        payload = ckpt.restore_checkpoint(path)
        np.testing.assert_array_equal(
            payload["params"]["backbone"]["w"],
            np.arange(6, dtype=np.float32).reshape(2, 3),
        )
        assert int(payload["step"]) == 7

    print("MULTIHOST_OK", pid, flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["SEMSEG_REPO"] = REPO
    env["SEMSEG_TMP"] = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out
