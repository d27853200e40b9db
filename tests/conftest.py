"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(``xla_force_host_platform_device_count``), the JAX-native way to test
``jax.sharding`` layouts without real multi-chip hardware (SURVEY.md
section 4). This must run before jax is imported by any test module.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
