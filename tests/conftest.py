"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere in the test process —
this file is imported by pytest before test modules.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session default is the TPU
_axon = os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # disable TPU relay
if _axon is not None:
    # stash for TPU-marked subprocess tests (test_export.py) that need
    # the real chip back
    os.environ["SEMSEG_AXON_POOL_IPS_ORIG"] = _axon
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 8 virtual devices serialize onto ONE physical core here; a partition
    # can reach a cross-module all-reduce minutes after its peers. XLA's
    # default 40 s rendezvous termination timeout then aborts the whole
    # process (observed: "only 5 of 8 arrived" in the train-step psum).
    # These timeouts exist to catch real deadlocks, not slow hosts — give
    # the oversubscribed mesh room.
    _flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    )
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# A site plugin may have pinned the TPU platform before this file ran;
# re-pin CPU while backends are still uninitialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
