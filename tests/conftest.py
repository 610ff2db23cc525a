"""Test config: force an 8-virtual-device CPU mesh before jax import.

Multi-chip sharding is validated on fake devices
(xla_force_host_platform_device_count) per SURVEY.md §4.5; the real-TPU
bench path is exercised separately by bench.py.
"""

import os

# Force CPU even when the shell env points JAX at a (possibly remote) TPU:
# unit tests must be fast and deterministic, and the sharding tests need
# 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# This box has few cores and XLA:CPU compiles are slow (~1s per tiny op);
# the persistent compilation cache makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

# The environment's sitecustomize registers a TPU plugin and imports jax
# before this conftest runs, so the env var alone is ignored — force the
# platform through the live config object.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests"
    )
