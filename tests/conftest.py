"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere in the test process —
this file is imported by pytest before test modules.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session default is the TPU
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # disable TPU relay plugin
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site plugin may have pinned the TPU platform before this file ran;
# re-pin CPU while backends are still uninitialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
