"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths (vision_basedsensor_tpu.parallel) are validated on a
virtual 8-device CPU mesh; real-TPU benchmarking happens in bench.py only.
This must run before any module imports jax.
"""
import os

# Some environments preload jax at interpreter startup (sitecustomize), so
# env vars alone can be too late; set both the env and the live jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
