"""High-level checkpoint loading with per-part npz caching.

Mirrors DepthProModelLoader::load_record (mod.rs:174-249): if a converted
cache file ``<stem>-{part}.npz`` exists next to the checkpoint it is loaded
directly; otherwise the ``.pt`` is parsed (once) and converted, and with
``convert_checkpoints=True`` the cache files are written (the reference's
``--convert-checkpoints`` writing ``depth_pro-{part}.mpk``,
mod.rs:211-227,244-246). A ``<stem>-config.json`` carrying the inferred
architecture is written alongside so cached parts remain loadable without
the original ``.pt``.

Cache format: one npz per part holding the converted (TPU-layout) leaves in
the deterministic order of ``models.spec.param_spec``; bfloat16 leaves are
stored as uint16 bit patterns with a dtype tag. Float leaves are cached in
f16 by default -- the reference's on-disk convention (mod.rs:211-227 always
writes HalfPrecision .mpk regardless of runtime dtype); loading casts to the
requested dtype.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import ml_dtypes

import jax
import jax.numpy as jnp

from matrix_eyes_tpu import timings
from matrix_eyes_tpu.config import ModelConfig
from matrix_eyes_tpu.errors import LoaderError
from matrix_eyes_tpu.models.spec import param_spec
from matrix_eyes_tpu.pt.convert import PARTS, convert_state_dict, infer_config
from matrix_eyes_tpu.pt.pickle_reader import read_pt_state_dict


def _stem(checkpoint_path: str) -> str:
    """Cache-file stem for derived caches.

    Prefer the REAL checkpoint location: a symlinked .pt (common for large
    checkpoints on shared storage) must find and write the same caches as
    the target path, not orphan them next to the link.  Fall back to the
    link-side stem when the real location already has no caches and is not
    writable (read-only shared storage), or when caches written by earlier
    versions live next to the link.
    """
    link_stem = os.path.splitext(os.path.abspath(checkpoint_path))[0]
    real_stem = os.path.splitext(os.path.realpath(checkpoint_path))[0]
    if real_stem == link_stem:
        return real_stem
    if os.path.exists(real_stem + "-config.json"):
        return real_stem
    if os.path.exists(link_stem + "-config.json"):
        return link_stem
    real_dir = os.path.dirname(real_stem) or "."
    return real_stem if os.access(real_dir, os.W_OK) else link_stem


def _cache_path(checkpoint_path: str, part: str) -> str:
    return f"{_stem(checkpoint_path)}-{part}.npz"


def _config_cache_path(checkpoint_path: str) -> str:
    return f"{_stem(checkpoint_path)}-config.json"


def save_part_cache(path: str, part_params: Any, cache_dtype=np.float16) -> None:
    """Write one part's converted leaves to ``path`` (atomically).

    ``cache_dtype`` defaults to f16, the reference's on-disk convention for
    ``--convert-checkpoints`` caches (mod.rs:211-227 always writes a
    HalfPrecision .mpk regardless of the runtime dtype); pass ``None`` to
    store the leaves' own dtype.
    """
    leaves = jax.tree.leaves(part_params)
    arrays: Dict[str, np.ndarray] = {}
    dtypes = []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        is_float = np.issubdtype(a.dtype, np.floating) or a.dtype == ml_dtypes.bfloat16
        if cache_dtype is not None and is_float:
            a = a.astype(cache_dtype)
        dtypes.append(str(a.dtype))
        if a.dtype == ml_dtypes.bfloat16:
            a = a.view(np.uint16)
        arrays[f"a{i:04d}"] = a
    arrays["manifest"] = np.frombuffer(
        json.dumps({"dtypes": dtypes, "n": len(leaves)}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _read_part_cache_np(path: str, part_spec: Any) -> Any:
    """Read an npz part cache into a host numpy tree (cache dtypes kept),
    validated against the model spec."""
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"]).decode())
        leaves = []
        for i in range(manifest["n"]):
            a = z[f"a{i:04d}"]
            if manifest["dtypes"][i] == "bfloat16":
                a = a.view(ml_dtypes.bfloat16)
            leaves.append(a)
    spec_leaves, treedef = jax.tree.flatten(part_spec)
    if len(spec_leaves) != len(leaves):
        raise LoaderError(
            f"cache {path} has {len(leaves)} tensors, model expects {len(spec_leaves)} "
            "(stale cache? delete it to reconvert)")
    for got, want in zip(leaves, spec_leaves):
        if tuple(got.shape) != tuple(want.shape):
            raise LoaderError(
                f"cache {path}: tensor shape {got.shape} != expected {want.shape} "
                "(stale cache? delete it to reconvert)")
    return jax.tree.unflatten(treedef, leaves)


def load_part_cache(path: str, part_spec: Any, dtype) -> Any:
    return _place_part(_read_part_cache_np(path, part_spec), dtype)


def _place_part(part_params: Any, dtype) -> Any:
    """Device-place a host numpy parameter tree with ONE host->device
    transfer per distinct leaf dtype (not per leaf).

    Through a remote device relay, each ``jnp.asarray(leaf)`` is a
    dispatch round-trip (~0.5 s); a ViT-L part has ~400 leaves, so
    per-leaf placement turns a ~60 s upload into ~20 minutes. Same-dtype
    leaves are concatenated into blobs on the host, uploaded in a handful
    of transfers, and sliced/reshaped/cast on device (the packed-cache
    trick, generalised and lossless for any source dtype). Blobs are
    capped at ~1 GB: a single multi-GB device_put (the f32 encoder part
    is 2.4 GB) failed UNAVAILABLE through the relay."""
    import jax.lax as lax

    leaves, treedef = jax.tree.flatten(part_params)
    if not leaves:
        return jax.tree.unflatten(treedef, [])
    max_blob = int(os.environ.get("MATRIX_EYES_MAX_UPLOAD_BYTES", 1 << 30))
    by_dtype: Dict[Any, list] = {}
    order = []
    for leaf in leaves:
        a = np.ascontiguousarray(leaf)
        lst = by_dtype.setdefault(a.dtype, [])
        order.append((a.dtype, len(lst)))
        lst.append(a)

    unpacked: Dict[Any, list] = {}
    for dt, arrs in by_dtype.items():
        chunks: list = []
        cur, cur_bytes = [], 0
        for a in arrs:
            if cur and cur_bytes + a.nbytes > max_blob:
                chunks.append(cur)
                cur, cur_bytes = [], 0
            cur.append(a)
            cur_bytes += a.nbytes
        chunks.append(cur)

        out: list = []
        for chunk in chunks:
            blob = np.concatenate([a.ravel() for a in chunk])
            meta = []
            off = 0
            for a in chunk:
                meta.append((off, int(a.size), a.shape))
                off += int(a.size)
            meta = tuple(meta)
            dev = jax.device_put(blob)

            @partial(jax.jit, static_argnames=())
            def unpack(b, meta=meta):
                return [lax.slice(b, (o,), (o + s,)).reshape(shape).astype(dtype)
                        for o, s, shape in meta]

            out.extend(unpack(dev))
        unpacked[dt] = out
    return jax.tree.unflatten(treedef, [unpacked[dt][i] for dt, i in order])


def _packed_paths(checkpoint_path: str, part: str) -> Tuple[str, str]:
    stem = _stem(checkpoint_path)
    return f"{stem}-{part}.packed.npy", f"{stem}-{part}.packed.json"


def save_packed_cache(checkpoint_path: str, part: str, part_params: Any,
                      cache_dtype=np.float16) -> None:
    """Write one part as a single contiguous f16 blob + manifest.

    The per-leaf npz cache pays a host-side price at load time: a zip read
    and an f16->runtime-dtype cast per leaf on the host (tens of seconds
    for the 0.95 B-parameter model on one core). The packed layout is one
    .npy blob of f16 bit patterns (u16), loaded with mmap (a memcpy), sent
    to the device as ONE transfer, and sliced/cast into leaves on device --
    host work is eliminated and the upload is a single stream.
    """
    leaves = jax.tree.leaves(part_params)
    segs = []
    entries = []
    off = 0
    for leaf in leaves:
        a = np.asarray(leaf)
        is_float = np.issubdtype(a.dtype, np.floating) or a.dtype == ml_dtypes.bfloat16
        if not is_float:
            raise LoaderError(
                f"packed cache supports float leaves only, got {a.dtype} "
                f"in part '{part}' (use the npz cache for mixed dtypes)")
        if a.dtype == ml_dtypes.bfloat16:
            a = a.astype(np.float32)
        a = a.astype(cache_dtype)
        flat = a.view(np.uint16).ravel()
        entries.append({"shape": list(a.shape), "offset": off, "size": int(flat.size)})
        segs.append(flat)
        off += int(flat.size)
    blob = np.concatenate(segs) if segs else np.zeros((0,), np.uint16)
    npy, manifest = _packed_paths(checkpoint_path, part)
    tmp = npy + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, blob)
    os.replace(tmp, npy)
    with open(manifest + ".tmp", "w") as f:
        json.dump({"dtype": "float16", "entries": entries}, f)
    os.replace(manifest + ".tmp", manifest)


def load_packed_cache(checkpoint_path: str, part: str, part_spec: Any, dtype) -> Any:
    """Load a packed part: mmap the blob, one device transfer, slice + cast
    on device (jitted; the unpack program is tiny and compiles in ~1 s)."""
    npy, manifest_path = _packed_paths(checkpoint_path, part)
    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
        entries = manifest["entries"]
        blob_dtype = manifest.get("dtype", "float16")
    except (OSError, ValueError, KeyError) as e:
        raise LoaderError(
            f"packed cache manifest {manifest_path} unreadable: {e} "
            "(stale cache? delete it to reconvert)") from e
    spec_leaves, treedef = jax.tree.flatten(part_spec)
    if len(spec_leaves) != len(entries):
        raise LoaderError(
            f"packed cache {npy} has {len(entries)} tensors, model expects "
            f"{len(spec_leaves)} (stale cache? delete it to reconvert)")
    for e, want in zip(entries, spec_leaves):
        if tuple(e["shape"]) != tuple(want.shape):
            raise LoaderError(
                f"packed cache {npy}: tensor shape {tuple(e['shape'])} != "
                f"expected {tuple(want.shape)} (stale cache? delete it)")
    try:
        blob = np.load(npy, mmap_mode="r")
    except (OSError, ValueError) as e:
        raise LoaderError(
            f"packed cache {npy} unreadable: {e} "
            "(stale cache? delete it to reconvert)") from e
    if blob_dtype != "float16":
        raise LoaderError(
            f"packed cache {npy} has dtype {blob_dtype}, this loader reads "
            "float16 blobs (stale cache? delete it to reconvert)")
    if blob.dtype != np.uint16 or blob.size != (entries[-1]["offset"] + entries[-1]["size"] if entries else 0):
        raise LoaderError(f"packed cache {npy} is corrupt (delete it to reconvert)")
    dev = jax.device_put(blob)

    import jax.lax as lax

    shapes = tuple((e["offset"], e["size"], tuple(e["shape"])) for e in entries)

    @jax.jit
    def unpack(b):
        out = []
        for off, size, shape in shapes:
            seg = lax.slice(b, (off,), (off + size,))
            x = lax.bitcast_convert_type(seg, jnp.float16).reshape(shape)
            out.append(x.astype(dtype))
        return out
    return jax.tree.unflatten(treedef, unpack(dev))


def _pt_stat(checkpoint_path: str):
    try:
        st = os.stat(checkpoint_path)
        return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
    except OSError:
        return None


def _load_config_cache(path: str) -> ModelConfig:
    with open(path) as f:
        d = json.load(f)
    d.pop("pt_stat", None)
    d["encoder_feature_dims"] = tuple(d["encoder_feature_dims"])
    d["head_last_dims"] = tuple(d["head_last_dims"])
    d["highres_block_ids"] = tuple(d["highres_block_ids"])
    return ModelConfig(**d)


def _save_cache_nonfatal(write, what: str) -> None:
    """Run a cache-writing thunk; on OSError warn and continue.  Cache
    files are an optimization -- a read-only checkpoint directory (shared
    storage where even os.access lies for root on an EROFS mount) must
    degrade to converting on every run, not crash the load."""
    try:
        write()
    except OSError as e:
        print(f"warning: could not write {what}: {e} "
              "(continuing without caching)", file=sys.stderr)


def _purge_caches(checkpoint_path: str) -> None:
    """Remove every derived cache for ``checkpoint_path`` (all parts, not
    just the ones being loaded).  Called when the .pt was replaced in
    place: reconverting only the requested parts and then re-stamping the
    config cache would otherwise leave the OTHER parts' caches -- from the
    old checkpoint, but matching the new stamp -- to be trusted silently
    by a later load."""
    stem = _stem(checkpoint_path)
    for part in PARTS:
        for path in (f"{stem}-{part}.npz", f"{stem}-{part}.packed.npy",
                     f"{stem}-{part}.packed.json"):
            try:
                os.remove(path)
            except OSError:
                pass


def _caches_stale(checkpoint_path: str) -> bool:
    """True if the .pt on disk no longer matches the (size, mtime) stamp
    recorded in the config cache at convert time -- i.e. the checkpoint was
    replaced in place and every derived cache must be rebuilt.  Config
    caches written before the stamp existed carry no stamp; they are
    trusted unless the .pt is *newer* than the cache file itself (the one
    observable sign of an in-place replacement), which closes the one-time
    stale-weights window without invalidating untouched caches."""
    ccache = _config_cache_path(checkpoint_path)
    if not os.path.exists(ccache):
        return False
    try:
        with open(ccache) as f:
            stamp = json.load(f).get("pt_stat")
    except (OSError, ValueError):
        return True
    cur = _pt_stat(checkpoint_path)
    if stamp is None:
        try:
            return cur is not None and cur["mtime_ns"] > os.stat(ccache).st_mtime_ns
        except OSError:
            return True
    return cur is not None and stamp != cur


def load_checkpoint(
    checkpoint_path: str,
    dtype=jnp.float32,
    convert_checkpoints: bool = False,
    parts: Sequence[str] = PARTS,
    progress=None,
    cfg: Optional[ModelConfig] = None,
    use_caches: bool = True,
) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Load (and possibly cache-convert) model parameters.

    Returns (cfg, params). The architecture is inferred from the checkpoint
    shapes unless ``cfg`` is given; with only cache files present, the
    config comes from ``<stem>-config.json``.

    ``use_caches=False`` ignores every derived cache and loads straight
    from the .pt, writing nothing -- the parity/attribution probes need
    the checkpoint's own values at the requested dtype, not the f16
    on-disk cache convention (a .pt-f32 -> cache-f16 -> runtime-dtype
    round trip would fold cache rounding into what they measure).
    """
    flat: Optional[Dict[str, np.ndarray]] = None
    if not use_caches:
        stale, convert_checkpoints = True, False
    else:
        stale = _caches_stale(checkpoint_path)
        if stale and convert_checkpoints:
            _purge_caches(checkpoint_path)

    def read_flat() -> Dict[str, np.ndarray]:
        nonlocal flat
        if flat is None:
            if progress is not None:
                progress.update_message("reading checkpoint")
            if not os.path.exists(checkpoint_path):
                raise LoaderError(f"PyTorch store error: {checkpoint_path}: no such file")
            with timings.span("read .pt checkpoint"):
                flat = read_pt_state_dict(checkpoint_path)
        return flat

    if cfg is None:
        ccache = _config_cache_path(checkpoint_path)
        if os.path.exists(ccache) and not stale:
            # The config cache is written atomically alongside the part
            # caches and also records fields not recoverable from shapes
            # (num_heads); prefer it whenever it exists so a warm run never
            # re-parses the multi-GB .pt just to infer the architecture.
            cfg = _load_config_cache(ccache)
        else:
            cfg = infer_config(read_flat())

    spec = param_spec(cfg, include_fov="fov" in parts)
    out: Dict[str, Any] = {}
    uncached = []
    for part in parts:
        cpath = _cache_path(checkpoint_path, part)
        ppath, pmanifest = _packed_paths(checkpoint_path, part)
        if stale:
            uncached.append(part)
            continue
        if os.path.exists(ppath) and os.path.exists(pmanifest):
            if progress is not None:
                progress.update_message(f"loading packed {part}")
            with timings.span(f"weights {part} -> device (packed)"):
                out[part] = load_packed_cache(checkpoint_path, part, spec[part], dtype)
        elif os.path.exists(cpath):
            if progress is not None:
                progress.update_message(f"loading cached {part}")
            if convert_checkpoints:
                # upgrade an existing per-leaf cache to the packed layout
                # (both store the f16 convention, so nothing is lost);
                # all host-side until the single placement upload
                pnp = _read_part_cache_np(cpath, spec[part])
                _save_cache_nonfatal(
                    lambda: save_packed_cache(checkpoint_path, part, pnp),
                    f"packed cache for '{part}'")
                with timings.span(f"weights {part} -> device"):
                    out[part] = _place_part(pnp, dtype)
            else:
                with timings.span(f"weights {part} -> device (npz)"):
                    out[part] = load_part_cache(cpath, spec[part], dtype)
        else:
            uncached.append(part)

    if uncached:
        # host-side conversion: caches are written from host memory and the
        # device placement is one blob upload per part (_place_part) -- a
        # per-leaf device round-trip here measured ~20 minutes through the
        # dev relay for the 0.95 B-parameter model
        with timings.span("convert state dict (host)"):
            converted = convert_state_dict(cfg, read_flat(), dtype=dtype,
                                           parts=tuple(uncached), device=False)
        for part in uncached:
            if convert_checkpoints:
                if progress is not None:
                    progress.update_message(f"caching converted {part}")
                _save_cache_nonfatal(
                    lambda: (save_part_cache(_cache_path(checkpoint_path, part),
                                             converted[part]),
                             save_packed_cache(checkpoint_path, part,
                                               converted[part])),
                    f"weight caches for '{part}'")
            with timings.span(f"weights {part} -> device"):
                out[part] = _place_part(converted[part], dtype)
        if convert_checkpoints:
            def write_config():
                d = dataclasses.asdict(cfg)
                d["pt_stat"] = _pt_stat(checkpoint_path)
                with open(_config_cache_path(checkpoint_path), "w") as f:
                    json.dump(d, f, indent=1)
            _save_cache_nonfatal(write_config, "config cache")

    return cfg, {part: out[part] for part in parts}
