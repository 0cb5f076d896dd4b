"""Test config: run on a virtual 8-device CPU mesh so sharding tests work
without TPU hardware (SURVEY.md §4 item 5).

NOTE: the session's 'axon' TPU-tunnel plugin force-registers itself and
ignores the JAX_PLATFORMS env var, so the platform must be forced via
jax.config AFTER import (verified: env-var alone still yields the TPU).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: tests re-jit the same programs on every
# pytest invocation; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (notebook execution, e2e)")
