"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on `--xla_force_host_platform_device_count=8` CPU devices. The benchmark
(`bench.py`) runs on the real TPU chip instead.

Note: this image's sitecustomize registers the `axon` TPU PJRT plugin in every
interpreter and it overrides the JAX_PLATFORMS env var, so we must force the
CPU platform via jax.config *before any backend is initialized* — hence the
import-time dance below.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the suite is compile-dominated on this 1-core box: the persistent XLA
# cache makes every re-run reuse the previous run's executables
from pislamfusion_tpu.core.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
