"""Test config: simulate an 8-device TPU-style mesh on CPU.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count=8) — the JAX-native analog of testing
DDP without a cluster. The persistent compilation cache makes repeated runs
cheap on this single-core host.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU plugin force-registers itself ('axon,cpu') and wins
# over JAX_PLATFORMS; every eager op would dispatch through the TPU tunnel.
# Tests must run on the virtual 8-device CPU mesh, so override after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped on purpose: a shared session stream makes every
    # test's data depend on which tests ran before it, so adding a test
    # file can flip a marginal tolerance elsewhere (observed: the 8-bit
    # EP parity test failing only in the full suite). Fresh seed per test
    # = order-independent, reproducible-in-isolation data.
    return np.random.RandomState(1234)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "golden: parity tests against torch/reference (slow)")
    config.addinivalue_line("markers", "slow: long-running tests")
