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
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache (env vars are too late — jax is already imported
# by sitecustomize, so they must go through jax.config). CPU tests use
# their OWN cache dir: the axon terminal's remote compiler writes TPU-run
# CPU-AOT entries built for a different host (AMX/AVX512) whose load on
# this machine warns/crashes (cpu_aot_loader machine-feature mismatch).
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Tests validate math in double precision where they pass f64 inputs; the
# library is dtype-polymorphic and the pipeline runs f32/bf16 on TPU.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules. A full-suite run
    accumulates hundreds of CPU executables in one process and the XLA CPU
    compiler eventually segfaults on this 2-core image; the persistent
    compilation cache (above) makes re-compiles cheap."""
    yield
    jax.clear_caches()
