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


def pytest_sessionfinish(session, exitstatus):
    """Skip-audit gate (MATRIX_EYES_ENFORCE_SKIPS=1, set in CI): a green
    run may only skip for reasons in the expected-skip registry
    (tests/expected_skips.py) -- any other skip is a regression hiding
    behind a skip and fails the session. Membership only, not counts, so
    partial runs (pytest tests/test_foo.py) stay usable."""
    import os

    if os.environ.get("MATRIX_EYES_ENFORCE_SKIPS") != "1":
        return
    from expected_skips import EXPECTED

    reporter = session.config.pluginmanager.get_plugin("terminalreporter")
    if reporter is None:
        return
    rogue = []
    for rep in reporter.stats.get("skipped", []):
        # longrepr is (path, lineno, "Skipped: <reason>")
        reason = rep.longrepr[2] if isinstance(rep.longrepr, tuple) else str(rep.longrepr)
        reason = reason.removeprefix("Skipped: ")
        if not any(reason == exp for exp in EXPECTED):
            rogue.append((rep.nodeid, reason))
    if rogue:
        import pytest

        reporter.write_line("")
        for nodeid, reason in rogue:
            reporter.write_line(
                f"UNEXPECTED SKIP (not in tests/expected_skips.py): "
                f"{nodeid}: {reason}", red=True)
        # the supported way to force the session exit code from this hook
        # (wrap_session catches exit.Exception and adopts its returncode)
        pytest.exit("unexpected skips (see above)", returncode=1)
