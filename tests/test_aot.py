"""AOT executable cache (aot.py): persist + reload compiled programs."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matrix_eyes_tpu import aot


@pytest.fixture()
def cachedir(tmp_path, monkeypatch):
    d = str(tmp_path / "aot")
    monkeypatch.setenv("MATRIX_EYES_AOT_CACHE", d)
    aot._live.clear()
    yield d
    aot._live.clear()


def test_call_cached_persists_and_reloads(cachedir):
    calls = []

    def fn(x):
        calls.append(1)
        return (x * 2.0).sum()

    x = jnp.arange(8.0)
    out1 = aot.call_cached("t1", fn, (x,))
    files = [f for f in os.listdir(cachedir) if f.endswith(".jaxexec")]
    assert len(files) == 1

    # simulate a fresh process: drop the live memo; the disk entry must be
    # used without re-tracing fn
    aot._live.clear()
    calls.clear()
    out2 = aot.call_cached("t1", fn, (x,))
    assert calls == []  # never re-traced
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_corrupt_cache_falls_back(cachedir):
    x = jnp.arange(4.0)
    aot.call_cached("t2", lambda x: x + 1, (x,))
    files = [f for f in os.listdir(cachedir) if f.endswith(".jaxexec")]
    with open(os.path.join(cachedir, files[0]), "wb") as f:
        f.write(b"garbage")
    aot._live.clear()
    out = aot.call_cached("t2", lambda x: x + 1, (x,))
    np.testing.assert_allclose(np.asarray(out), np.arange(4.0) + 1)


def test_key_varies_with_shape_and_salt(cachedir):
    k1 = aot._key("n", (jnp.zeros((2, 3)),), "")
    k2 = aot._key("n", (jnp.zeros((2, 4)),), "")
    k3 = aot._key("n", (jnp.zeros((2, 3)),), "other-config")
    assert len({k1, k2, k3}) == 3


def test_disabled_env_uses_plain_jit(cachedir, monkeypatch):
    monkeypatch.setenv("MATRIX_EYES_AOT", "off")
    x = jnp.arange(4.0)
    out = aot.call_cached("t3", lambda x: x * 3, (x,))
    np.testing.assert_allclose(np.asarray(out), np.arange(4.0) * 3)
    assert not os.path.exists(cachedir) or not os.listdir(cachedir)


def test_concurrent_cold_misses_compile_once(cachedir):
    """N threads hitting the same cold key must compile exactly once (the
    per-key miss lock): serve dispatches readback/encode programs from
    handler threads, and a duplicated multi-minute remote compile is the
    failure mode the lock exists for."""
    import threading

    compiles = []
    barrier = threading.Barrier(4)
    results = []

    def fn(x):
        compiles.append(1)  # runs once per TRACE (i.e. per compile)
        return (x + 1.0).sum()

    x = jnp.arange(16.0)

    def worker():
        barrier.wait()
        results.append(np.asarray(
            aot.call_cached("concurrent", fn, (x,), salt="s")))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    assert all(r == results[0] for r in results)
    assert len(compiles) == 1, f"compiled {len(compiles)} times, want 1"
