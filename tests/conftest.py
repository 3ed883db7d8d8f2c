"""Test configuration: run JAX on CPU with 8 virtual devices and float64.

The multi-chip sharding tests use an 8-device CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver validates
the multi-chip path; numeric tests need x64 for golden-value parity with the
reference's double-precision CTest numbers.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
