"""Persistent AOT executable cache: instant warm starts.

The reference is an ahead-of-time compiled binary -- ``main.rs:149-173``
starts doing useful work immediately. A JAX process instead pays a trace +
XLA compile on first call of each jitted program, which for the production
model is the bulk of warm CLI latency. This module persists the *compiled
PJRT executable* (``jax.experimental.serialize_executable``) keyed on the
exact input signature, device, and package source fingerprint, so a warm
CLI invocation deserializes the binary instead of recompiling it --
the reference's AOT property, rebuilt the JAX way.

Scope note: the JAX persistent *compilation* cache keys on HLO and still
re-traces + re-lowers; on remote-compile backends it may not help at all.
Serializing the executable skips tracing, lowering, and compilation
entirely -- the only remaining warm costs are weight upload and IO.

Safety: the cache key includes a fingerprint of every source file in this
package (size + mtime), the JAX version, and the device platform/kind, so
editing model code or switching devices invalidates entries automatically.
Set ``MATRIX_EYES_AOT=off`` to disable, ``MATRIX_EYES_AOT_CACHE=<dir>`` to
relocate (default ``$XDG_CACHE_HOME/matrix-eyes-tpu/aot``), and
``MATRIX_EYES_AOT_LOG=1`` to print a line per cache miss (a warm run that
hits a remote compiler mid-flight is otherwise hard to diagnose).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable, Dict, Sequence, Tuple

import jax

# Thread-safety invariant (serve.py dispatches readback/encode programs
# from handler threads): _live/_prefetched are plain dicts mutated only by
# GIL-atomic single ops, so READS never need a lock; the expensive miss
# path (deserialize or compile, minutes on a remote compiler) is guarded by
# a per-key lock so N concurrent first requests for the same program
# compile exactly once. Different keys still compile concurrently.
_live: Dict[str, Any] = {}
_fingerprint_memo: str | None = None
_prefetched: Dict[str, Future] = {}
_miss_locks: Dict[str, threading.Lock] = {}
_miss_locks_guard = threading.Lock()
# prefetched-but-never-consumed futures (a prefix's other signature
# variants, stale fingerprints) would otherwise pin deserialized
# executables for the life of the process; cap with FIFO eviction
_PREFETCH_CAP = 32


def prefetch_async(name_prefixes: Sequence[str], per_prefix: int = 2) -> None:
    """Start deserializing cached executables on a background thread.

    The warm CLI's two big serial costs are independent: the ~GBs weight
    upload (network/PCIe-bound) and the executable payload read +
    deserialize (CPU/disk-bound). Calling this before the checkpoint load
    overlaps them: by the time the first ``call_cached`` runs, its
    executable is (being) loaded already.

    Only files whose name starts with one of ``name_prefixes`` are touched,
    newest ``per_prefix`` per prefix (older same-name entries are likely
    stale fingerprints). Unknown/mismatched entries cost a wasted read, not
    correctness: ``call_cached`` still keys on the exact signature.
    """
    if not enabled():
        return
    d = cache_dir()
    try:
        files = [f for f in os.listdir(d) if f.endswith(".jaxexec")]
    except OSError:
        return
    by_prefix: Dict[str, list] = {p: [] for p in name_prefixes}
    for f in files:
        for p in name_prefixes:
            if f.startswith(p + "-"):
                by_prefix[p].append(f)
    def mtime(f):
        # a concurrent process may unlink a stale entry between listdir and
        # here; prefetch is purely an optimization, so never let that crash
        try:
            return os.path.getmtime(os.path.join(d, f))
        except OSError:
            return 0.0

    ex = ThreadPoolExecutor(max_workers=1)
    for p, fs in by_prefix.items():
        fs.sort(key=mtime, reverse=True)
        for f in fs[:per_prefix]:
            key = f[: -len(".jaxexec")]
            if key not in _prefetched:
                _prefetched[key] = ex.submit(_load, key)
    ex.shutdown(wait=False)
    while len(_prefetched) > _PREFETCH_CAP:
        _prefetched.pop(next(iter(_prefetched)))


def enabled() -> bool:
    return os.environ.get("MATRIX_EYES_AOT", "on").lower() not in ("0", "off", "false")


def cache_dir() -> str:
    d = os.environ.get("MATRIX_EYES_AOT_CACHE")
    if d:
        return d
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(base, "matrix-eyes-tpu", "aot")


def source_fingerprint() -> str:
    """Hash of (path, size, mtime) for every source file in the package.
    Editing any module invalidates cached executables -- cheap (<10 ms) and
    conservative (a reinstall is just a cache miss)."""
    global _fingerprint_memo
    if _fingerprint_memo is not None:
        return _fingerprint_memo
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, files in sorted(os.walk(root)):
        dirnames.sort()
        if "__pycache__" in dirpath:
            continue
        for f in sorted(files):
            if f.endswith((".py", ".cpp")):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                rel = os.path.relpath(p, root)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    _fingerprint_memo = h.hexdigest()[:16]
    return _fingerprint_memo


def _abstract_sig(args: Sequence[Any]) -> str:
    leaves, treedef = jax.tree.flatten(args)
    parts = [str(treedef)]
    for l in leaves:
        a = jax.api_util.shaped_abstractify(l)
        # Input shardings are part of the compiled executable's contract:
        # the same shapes arriving mesh-sharded (--devices) vs single-device
        # must not replay each other's binaries.
        sh = getattr(l, "sharding", None)
        parts.append(f"{a.dtype}{tuple(a.shape)}@{sh}")
    return "|".join(parts)


def _key(name: str, args: Sequence[Any], salt: str) -> str:
    dev = jax.devices()[0]
    desc = "\n".join([
        name,
        salt,
        # compile-affecting environment toggles: without these in the key a
        # warm cache silently replays an executable compiled under the old
        # settings (e.g. the Pallas-conv kill switch having no effect)
        os.environ.get("MATRIX_EYES_NO_PALLAS_CONV", ""),
        os.environ.get("XLA_FLAGS", ""),
        # trace-time matmul precision (configure_matmul_precision sets
        # HIGHEST for f32-on-TPU): an executable compiled under one
        # precision regime must not be replayed under another
        str(jax.config.jax_default_matmul_precision),
        jax.__version__,
        getattr(dev, "device_kind", "?"),
        getattr(dev.client, "platform", "?"),
        getattr(dev.client, "platform_version", "?"),
        source_fingerprint(),
        _abstract_sig(args),
    ])
    return f"{name}-{hashlib.sha256(desc.encode()).hexdigest()[:24]}"


def _load(key: str):
    path = os.path.join(cache_dir(), key + ".jaxexec")
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        from matrix_eyes_tpu import timings

        with timings.span("aot deserialize"):
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            return se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception:
        # stale/corrupt/incompatible entry: drop it and recompile
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def _store(key: str, compiled) -> None:
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        d = cache_dir()
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, os.path.join(d, key + ".jaxexec"))
    except Exception:
        pass  # caching is best-effort; the compiled program still runs


def call_cached(name: str, fn: Callable, args: Tuple, salt: str = ""):
    """Call ``fn(*args)`` through a persistently cached compiled executable.

    ``fn`` must close over all static configuration (it is compiled for
    exactly these arg shapes/dtypes); ``salt`` should fold in whatever
    static state the closure captures (config repr, flags). Any cache
    failure falls back to a fresh jit compile, then repopulates the cache.
    """
    if not enabled():
        # Cache the jitted callable by key so repeated calls (batch mode)
        # hit jax.jit's own compilation cache instead of retracing a fresh
        # closure per image.
        key = "nojit-" + _key(name, args, salt)
        jitted = _live.get(key)
        if jitted is None:
            jitted = _live[key] = jax.jit(fn)
        return jitted(*args)
    key = _key(name, args, salt)
    comp = _live.get(key)
    if comp is None:
        with _miss_locks_guard:
            key_lock = _miss_locks.setdefault(key, threading.Lock())
        with key_lock:
            comp = _live.get(key)  # a concurrent miss may have filled it
            if comp is None:
                fut = _prefetched.pop(key, None)
                if fut is not None:
                    try:
                        comp = fut.result()
                    except Exception:
                        comp = None
                if comp is None:
                    comp = _load(key)
                if comp is None:
                    if os.environ.get("MATRIX_EYES_AOT_LOG"):
                        import sys

                        print(f"aot: MISS {name} -> compiling (key {key[:12]})",
                              file=sys.stderr, flush=True)
                    comp = jax.jit(fn).lower(*args).compile()
                    _store(key, comp)
                _live[key] = comp
    try:
        return comp(*args)
    except Exception:
        # signature drift the key missed (e.g. weak types): recompile live
        comp = jax.jit(fn).lower(*args).compile()
        _live[key] = comp
        return comp(*args)
