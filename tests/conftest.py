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
