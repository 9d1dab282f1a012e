"""Test harness configuration.

Tests always run on a virtual 8-device CPU mesh so multi-chip sharding paths
are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). x64 stays OFF — the library must be correct in the same
f32-default regime it runs in on TPU.

NOTE: this image pre-imports jax from sitecustomize (TPU tunnel plugin), so
environment variables set here are too late — platform selection must go
through ``jax.config.update``. Without it, tests silently run through the
remote TPU tunnel and are 10-50x slower.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # effective when jax not yet imported
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Persistent compilation cache: compiles amortise across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
