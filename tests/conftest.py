"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(``xla_force_host_platform_device_count``), the JAX-native way to test
``jax.sharding`` layouts without real multi-chip hardware (SURVEY.md
section 4). This must run before jax is imported by any test module.
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# Keep test-compiled AOT executables out of the user cache.
os.environ.setdefault("MATRIX_EYES_AOT_CACHE", tempfile.mkdtemp(prefix="me_aot_test_"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pin JAX_PLATFORMS to a hardware plugin at interpreter
# startup (site hook); the config API wins over the env var, so force CPU
# here, before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
