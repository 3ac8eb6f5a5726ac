"""Test configuration: run everything on a virtual 8-device CPU mesh.

The image's sitecustomize imports jax at interpreter start, registers the
axon TPU backend, and pins jax.config jax_platforms="axon,cpu" — so env vars
alone cannot select CPU. We override the config back to "cpu" here, before
any backend is initialized, and request 8 virtual host devices (mirrors the
multi-chip dry-run the driver performs via __graft_entry__.dryrun_multichip).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests validate math in double precision where they pass f64 inputs; the
# library is dtype-polymorphic and the pipeline runs f32/bf16 on TPU.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
