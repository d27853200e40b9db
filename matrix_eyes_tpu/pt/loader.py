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


def _mixed_cache_path(checkpoint_path: str, part: str) -> str:
    """npz cache for the mixed layout (ops/mixed.py), leaves stored at
    their EXACT dtypes (cache_dtype=None): bf16 block matmuls, f32 rest.
    Separate from the f16-convention float caches because the mixed
    layout's point is keeping the protected groups at the checkpoint's
    own f32 -- an f16 round trip would fold ~1/8 of the bf16 rounding it
    exists to remove back in."""
    return f"{_stem(checkpoint_path)}-{part}.mixed.npz"


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


def _place_part(part_params: Any, dtype, exact_dtypes: Tuple = ()) -> Any:
    """Device-place a host numpy parameter tree with ONE host->device
    transfer per distinct leaf dtype (not per leaf).

    Through a remote device relay, each ``jnp.asarray(leaf)`` is a
    dispatch round-trip (~0.5 s); a ViT-L part has ~400 leaves, so
    per-leaf placement turns a ~60 s upload into ~20 minutes. Same-dtype
    leaves are concatenated into blobs on the host, uploaded in a handful
    of transfers, and sliced/reshaped/cast on device (the packed-cache
    trick, generalised and lossless for any source dtype). Blobs are
    capped at ~1 GB: a single multi-GB device_put (the f32 encoder part
    is 2.4 GB) failed UNAVAILABLE through the relay.

    Leaves whose dtype is in ``exact_dtypes`` keep it instead of casting to
    ``dtype`` -- the int8-quantized trees carry int8 weights and f32 scales
    that must survive placement as-is."""
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
        target = dt if dt in tuple(np.dtype(e) for e in exact_dtypes) else dtype
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
            def unpack(b, meta=meta, target=target):
                return [lax.slice(b, (o,), (o + s,)).reshape(shape).astype(target)
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


def _read_packed_manifest(checkpoint_path: str, part: str, part_spec: Any):
    """Open + fully validate a packed f16 part cache.

    Returns ``(blob, entries, treedef)`` with the manifest parsed, the
    entry count and every shape checked against the model spec, and the
    blob's dtype and total size verified -- the one shared gate for both
    the device loader and the host reader, so a corrupt or stale cache
    always surfaces as a LoaderError with delete-to-reconvert guidance."""
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
    return blob, entries, treedef


def load_packed_cache(checkpoint_path: str, part: str, part_spec: Any, dtype) -> Any:
    """Load a packed part: mmap the blob, one device transfer, slice + cast
    on device (jitted; the unpack program is tiny and compiles in ~1 s)."""
    blob, entries, treedef = _read_packed_manifest(checkpoint_path, part, part_spec)
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


def _read_packed_cache_np(checkpoint_path: str, part: str, part_spec: Any) -> Any:
    """Read a packed f16 part cache into a host numpy tree (f16 leaves) --
    the int8 quantization path needs host values, not a device upload."""
    blob, entries, treedef = _read_packed_manifest(checkpoint_path, part, part_spec)
    leaves = []
    for e in entries:
        seg = blob[e["offset"]:e["offset"] + e["size"]]
        leaves.append(np.asarray(seg).view(np.float16).reshape(e["shape"]))
    return jax.tree.unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# packed8: mixed-dtype packed caches for the int8-quantized layout.
# One byte blob per part, grouped into per-dtype REGIONS (int8 weights, f32
# scales, f16-convention float leaves), plus a manifest. The warm int8 load
# is a single mmap + one device upload per region (<=3), each in the
# region's NATIVE dtype, unpacked by same-width slice/reshape on device.
#
# Why regions instead of interleaved leaves (the v1 format): uploading one
# u8 blob and widening u8 pairs/quads into f16/f32 on device requires
# reshape(-1, 2|4) intermediates, and a 2-wide u8 array on TPU pads its
# minor dim to the 128-lane tile -- XLA's slice/reshape simplifier turned
# the per-leaf slices into ONE whole-blob reshape whose padded allocation
# was 64x the data (41.8 GB for the 653 MB encoder; a real compile failure).
# Native-dtype region uploads need no bitcasts at all.

_PACKED8_SCHEME = "vit-int8-v2"
_PACKED8_ALIGN = 64  # region starts are 64-byte aligned for host .view()

_REGION_NP = {"int8": np.int8, "float32": np.float32, "float16": np.float16}


def _packed8_paths(checkpoint_path: str, part: str) -> Tuple[str, str]:
    stem = _stem(checkpoint_path)
    return f"{stem}-{part}.packed8.npy", f"{stem}-{part}.packed8.json"


def save_packed8_cache(checkpoint_path: str, part: str, part_params: Any) -> None:
    """Write an int8-quantized part as one region-grouped byte blob + manifest.

    Leaves are stored in their exact dtypes: int8 weights as-is, f32
    scales as-is, other float leaves in the f16 on-disk convention. Each
    leaf's manifest entry records its region and element offset/size within
    that region (tree order is preserved per region and overall)."""
    leaves = jax.tree.leaves(part_params)
    regions: Dict[str, list] = {"int8": [], "float32": [], "float16": []}
    offs = {k: 0 for k in regions}
    entries = []
    for leaf in leaves:
        a = np.asarray(leaf)
        if a.dtype == np.int8:
            rd = "int8"
        elif a.dtype == np.float32:
            rd = "float32"
        elif np.issubdtype(a.dtype, np.floating) or a.dtype == ml_dtypes.bfloat16:
            a = a.astype(np.float16)
            rd = "float16"
        else:
            raise LoaderError(
                f"packed8 cache: unsupported leaf dtype {a.dtype} in '{part}'")
        flat = np.ascontiguousarray(a).ravel()
        entries.append({"shape": list(a.shape), "dtype": rd,
                        "offset": offs[rd], "size": int(flat.size)})
        regions[rd].append(flat)
        offs[rd] += int(flat.size)
    parts_u8 = []
    region_meta = {}
    byte_off = 0
    for rd in ("int8", "float32", "float16"):
        if not regions[rd]:
            continue
        pad = -byte_off % _PACKED8_ALIGN
        if pad:
            parts_u8.append(np.zeros(pad, np.uint8))
            byte_off += pad
        r = np.concatenate(regions[rd]).view(np.uint8)
        region_meta[rd] = {"offset": byte_off, "size": int(r.size)}
        parts_u8.append(r)
        byte_off += int(r.size)
    blob = np.concatenate(parts_u8) if parts_u8 else np.zeros((0,), np.uint8)
    npy, manifest = _packed8_paths(checkpoint_path, part)
    tmp = npy + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, blob)
    os.replace(tmp, npy)
    with open(manifest + ".tmp", "w") as f:
        json.dump({"scheme": _PACKED8_SCHEME, "regions": region_meta,
                   "entries": entries}, f)
    os.replace(manifest + ".tmp", manifest)


def load_packed8_cache(checkpoint_path: str, part: str, qpart_spec: Any,
                       dtype) -> Any:
    """Load an int8-quantized part: mmap the byte blob, one device upload
    per dtype region (in the region's native dtype), slice/reshape on
    device. ``qpart_spec`` is the quantized spec (ops.quant.quantize_spec)
    the entries are validated against."""
    npy, manifest_path = _packed8_paths(checkpoint_path, part)
    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get("scheme") != _PACKED8_SCHEME:
            raise LoaderError(
                f"packed8 cache {npy} has scheme {manifest.get('scheme')!r}, "
                f"this loader reads {_PACKED8_SCHEME!r}")
        entries = manifest["entries"]
        region_meta = manifest["regions"]
        blob = np.load(npy, mmap_mode="r")
    except (OSError, ValueError, KeyError) as e:
        raise LoaderError(
            f"packed8 cache for '{part}' unreadable: {e} "
            "(stale cache? delete it to reconvert)") from e
    spec_leaves, treedef = jax.tree.flatten(qpart_spec)
    if len(spec_leaves) != len(entries):
        raise LoaderError(
            f"packed8 cache {npy} has {len(entries)} tensors, model expects "
            f"{len(spec_leaves)} (stale cache? delete it to reconvert)")
    for e, want in zip(entries, spec_leaves):
        # shape must match exactly; dtype is validated by CLASS only (int8
        # where the quantized spec says int8, a float region elsewhere):
        # the float region is the writer's choice -- f32 for the scales,
        # the f16 on-disk convention for everything else -- while the spec
        # (models.spec.param_spec) declares all float leaves f32.
        want_int8 = jnp.dtype(want.dtype) == jnp.int8
        if (tuple(e["shape"]) != tuple(want.shape)
                or (e["dtype"] == "int8") != want_int8
                or e["dtype"] not in _REGION_NP):
            raise LoaderError(
                f"packed8 cache {npy}: tensor {tuple(e['shape'])}/{e['dtype']} "
                f"!= expected {tuple(want.shape)}"
                f"/{'int8' if want_int8 else 'float'} (stale cache? delete it)")
    ends = {}
    for e in entries:
        ends[e["dtype"]] = max(ends.get(e["dtype"], 0), e["offset"] + e["size"])
    if blob.dtype != np.uint8 or set(ends) != set(region_meta) or any(
            region_meta[rd]["offset"] % np.dtype(_REGION_NP[rd]).itemsize
            or ends[rd] * np.dtype(_REGION_NP[rd]).itemsize != region_meta[rd]["size"]
            or region_meta[rd]["offset"] + region_meta[rd]["size"] > blob.size
            for rd in ends):
        raise LoaderError(f"packed8 cache {npy} is corrupt (delete it to reconvert)")

    devs = {}
    for rd, meta in region_meta.items():
        o, s = meta["offset"], meta["size"]
        host = np.asarray(blob[o:o + s]).view(_REGION_NP[rd])
        devs[rd] = jax.device_put(host)

    import jax.lax as lax

    shapes = tuple((e["offset"], e["size"], tuple(e["shape"]), e["dtype"])
                   for e in entries)

    @jax.jit
    def unpack(regions):
        out = []
        for off, size, shape, rd in shapes:
            x = lax.slice(regions[rd], (off,), (off + size,)).reshape(shape)
            if rd == "float16":  # f16 on-disk convention -> runtime dtype
                x = x.astype(dtype)
            out.append(x)
        return out

    return jax.tree.unflatten(treedef, unpack(devs))


def _f16_convention(tree: Any) -> Any:
    """Round every float leaf through the f16 on-disk convention.

    Int8 quantization must be a pure function of the checkpoint, not of the
    cache state: a warm run re-quantizes from the f16 part caches, so a cold
    run (no caches yet, or unwritable directory) must quantize from the SAME
    f16-rounded values.  The cold loader converts at canonical f32 and this
    rounds that to f16(x) -- exactly the bytes save_part_cache /
    save_packed_cache write -- so both paths derive identical amax/scales/
    codes regardless of which files happen to exist."""

    def f(a):
        a = np.asarray(a)
        if a.dtype == ml_dtypes.bfloat16:
            return a.astype(np.float32).astype(np.float16)
        if np.issubdtype(a.dtype, np.floating):
            return a.astype(np.float16)
        return a

    return jax.tree.map(f, tree)


def _cast_float_leaves(tree: Any, dtype) -> Any:
    """Cast float leaves to the numpy view of ``dtype`` on the host.

    The cold loader converts at canonical f32 (see load_checkpoint); device
    placement must still upload runtime-width bytes, so the runtime cast
    happens here rather than on device."""
    np_dtype = jnp.dtype(dtype)

    def f(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating) or a.dtype == ml_dtypes.bfloat16:
            return np.ascontiguousarray(a.astype(np_dtype))
        return a

    return jax.tree.map(f, tree)


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
                     f"{stem}-{part}.packed.json", f"{stem}-{part}.packed8.npy",
                     f"{stem}-{part}.packed8.json", f"{stem}-{part}.mixed.npz"):
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
    quantize_int8: bool = False,
    mixed_bf16: bool = False,
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

    ``quantize_int8=True`` returns the int8-quantized parameter layout
    (ops/quant.py): ViT block weights int8 + f32 scales, everything else in
    ``dtype`` (must be bf16). Quantization happens on the host so the
    device upload is the int8 blob (~half the f16 bytes); with
    ``convert_checkpoints`` the quantized layout is cached as
    ``<stem>-<part>.packed8.*`` and warm runs mmap + upload it directly.

    ``mixed_bf16=True`` returns the mixed weight-precision layout
    (ops/mixed.py): ViT block matmul weights bf16, everything else at the
    checkpoint's own f32. The mixed layout is derived ONLY from the .pt
    (never from the f16-convention float caches, whose rounding it exists
    to avoid) and cached exactly as ``<stem>-<part>.mixed.npz`` when
    ``convert_checkpoints`` is set.
    """
    if quantize_int8 and jnp.dtype(dtype) != jnp.bfloat16:
        raise LoaderError(
            f"quantize_int8 requires the bf16 compute dtype, got "
            f"{jnp.dtype(dtype).name}")
    if mixed_bf16:
        if quantize_int8:
            raise LoaderError(
                "mixed_bf16 and quantize_int8 are mutually exclusive")
        if jnp.dtype(dtype) != jnp.bfloat16:
            raise LoaderError(
                f"mixed_bf16 requires the bf16 compute dtype, got "
                f"{jnp.dtype(dtype).name}")
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
    if quantize_int8:
        from matrix_eyes_tpu.ops.quant import quantize_params, quantize_spec

        qspec = quantize_spec(spec)
    out: Dict[str, Any] = {}
    uncached = []
    for part in parts:
        cpath = _cache_path(checkpoint_path, part)
        ppath, pmanifest = _packed_paths(checkpoint_path, part)
        if stale:
            uncached.append(part)
            continue
        if mixed_bf16:
            mpath = _mixed_cache_path(checkpoint_path, part)
            if os.path.exists(mpath):
                if progress is not None:
                    progress.update_message(f"loading mixed {part}")
                with timings.span(f"weights {part} -> device (mixed)"):
                    out[part] = _place_part(
                        _read_part_cache_np(mpath, spec[part]), dtype,
                        exact_dtypes=(ml_dtypes.bfloat16, np.float32))
            else:
                # never derive the mixed layout from the f16-convention
                # float caches: the protected groups must carry the
                # checkpoint's own f32 values (see _mixed_cache_path)
                uncached.append(part)
            continue
        if quantize_int8:
            p8npy, p8man = _packed8_paths(checkpoint_path, part)
            if os.path.exists(p8npy) and os.path.exists(p8man):
                if progress is not None:
                    progress.update_message(f"loading packed int8 {part}")
                try:
                    with timings.span(f"weights {part} -> device (packed int8)"):
                        out[part] = load_packed8_cache(
                            checkpoint_path, part, qspec[part], dtype)
                    continue
                except LoaderError as e:
                    # e.g. an old-scheme cache: fall through and re-quantize
                    # from the float caches (rewritten below when
                    # convert_checkpoints is set)
                    print(f"Warning: {e}; re-quantizing from float caches",
                          file=sys.stderr)
            host = None
            if os.path.exists(ppath) and os.path.exists(pmanifest):
                host = _read_packed_cache_np(checkpoint_path, part, spec[part])
            elif os.path.exists(cpath):
                host = _read_part_cache_np(cpath, spec[part])
            if host is None:
                uncached.append(part)
                continue
            if progress is not None:
                progress.update_message(f"quantizing {part}")
            with timings.span(f"quantize {part} (host)"):
                qhost = quantize_params(host)
            if convert_checkpoints:
                _save_cache_nonfatal(
                    lambda part=part, qhost=qhost: save_packed8_cache(
                        checkpoint_path, part, qhost),
                    f"packed int8 cache for '{part}'")
            with timings.span(f"weights {part} -> device (int8)"):
                out[part] = _place_part(qhost, dtype,
                                        exact_dtypes=(np.int8, np.float32))
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
            # Convert at canonical f32 (lossless from any source dtype).
            # Caches and int8 quantization must be pure functions of the
            # checkpoint, not of the runtime dtype of the run that happens
            # to write them: converting at the runtime dtype wrote
            # f16(bf16(x)) caches from bf16 runs but f16(x) from f32 runs,
            # so the same checkpoint quantized to two different int8 models
            # depending on cache state. The runtime cast happens host-side
            # just before placement (_cast_float_leaves), which is
            # bit-identical to converting at the runtime dtype directly
            # (convert_state_dict casts only at the end).
            converted = convert_state_dict(cfg, read_flat(), dtype=jnp.float32,
                                           parts=tuple(uncached), device=False)
        for part in uncached:
            # drop the part's canonical-f32 tree as soon as it is consumed:
            # at f32 the full converted model is ~2x the runtime bytes, and
            # holding every part while later parts build their runtime-width
            # copies would double peak host memory on the 0.95 B model
            host_part = converted.pop(part)
            if convert_checkpoints:
                if progress is not None:
                    progress.update_message(f"caching converted {part}")
                _save_cache_nonfatal(
                    lambda hp=host_part: (
                        save_part_cache(_cache_path(checkpoint_path, part), hp),
                        save_packed_cache(checkpoint_path, part, hp)),
                    f"weight caches for '{part}'")
            if mixed_bf16:
                from matrix_eyes_tpu.ops.mixed import cast_params_mixed

                with timings.span(f"mixed cast {part} (host)"):
                    mhost = cast_params_mixed(host_part)
                del host_part
                if convert_checkpoints:
                    _save_cache_nonfatal(
                        lambda part=part, mhost=mhost: save_part_cache(
                            _mixed_cache_path(checkpoint_path, part), mhost,
                            cache_dtype=None),
                        f"mixed cache for '{part}'")
                with timings.span(f"weights {part} -> device (mixed)"):
                    out[part] = _place_part(
                        mhost, dtype,
                        exact_dtypes=(ml_dtypes.bfloat16, np.float32))
                continue
            if quantize_int8:
                with timings.span(f"quantize {part} (host)"):
                    qhost = quantize_params(_f16_convention(host_part))
                del host_part
                if convert_checkpoints:
                    _save_cache_nonfatal(
                        lambda part=part, qhost=qhost: save_packed8_cache(
                            checkpoint_path, part, qhost),
                        f"packed int8 cache for '{part}'")
                with timings.span(f"weights {part} -> device (int8)"):
                    out[part] = _place_part(qhost, dtype,
                                            exact_dtypes=(np.int8, np.float32))
            else:
                with timings.span(f"weights {part} -> device"):
                    # cast on the host so the upload is runtime-width bytes,
                    # not the 4-byte canonical conversion
                    runtime_part = _cast_float_leaves(host_part, dtype)
                    del host_part
                    out[part] = _place_part(runtime_part, dtype)
        if convert_checkpoints:
            def write_config():
                d = dataclasses.asdict(cfg)
                d["pt_stat"] = _pt_stat(checkpoint_path)
                with open(_config_cache_path(checkpoint_path), "w") as f:
                    json.dump(d, f, indent=1)
            _save_cache_nonfatal(write_config, "config cache")

    return cfg, {part: out[part] for part in parts}
