"""Checkpoint loader cache behaviours (pt/loader.py)."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import TINY
from matrix_eyes_tpu.errors import LoaderError
from matrix_eyes_tpu.pt.convert import infer_config
from matrix_eyes_tpu.pt.loader import load_checkpoint

import torch_ref


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("loader")
    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=21)
    path = str(d / "m.pt")
    torch.save(tm.state_dict(), path)
    return path


def test_infer_config_matches_tiny(ckpt):
    from matrix_eyes_tpu.pt.pickle_reader import read_pt_state_dict

    cfg = infer_config(read_pt_state_dict(ckpt))
    assert cfg.vit_img_size == TINY.vit_img_size
    assert cfg.depth == TINY.depth
    assert cfg.embed_dim == TINY.embed_dim
    assert cfg.num_heads == TINY.num_heads
    assert cfg.encoder_feature_dims == TINY.encoder_feature_dims
    assert cfg.decoder_features == TINY.decoder_features
    assert cfg.head_last_dims == TINY.head_last_dims


def test_cache_roundtrip_and_dtype_cast(ckpt):
    cfg1, p1 = load_checkpoint(ckpt, dtype=jnp.bfloat16, convert_checkpoints=True)
    stem = os.path.splitext(ckpt)[0]
    assert os.path.exists(f"{stem}-encoder.npz")
    # the bf16 run sees bf16(x) -- the checkpoint's own values at the
    # requested dtype, not an artifact of cache precision
    _, src = load_checkpoint(ckpt, dtype=jnp.float32, use_caches=False)
    for s, a in zip(jax.tree.leaves(src), jax.tree.leaves(p1)):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(jnp.asarray(s).astype(jnp.bfloat16), np.float32),
            np.asarray(a, np.float32))
    # the cache stores the CHECKPOINT's canonical f16 rounding, regardless
    # of the runtime dtype of the run that wrote it (a bf16-writer cache
    # must not degrade a later f32 reader to 8 mantissa bits)
    cfg2, p2 = load_checkpoint(ckpt, dtype=jnp.float32)
    assert cfg2 == cfg1
    for s, b in zip(jax.tree.leaves(src), jax.tree.leaves(p2)):
        assert b.dtype == jnp.float32
        want = np.asarray(s, np.float32).astype(np.float16).astype(np.float32)
        np.testing.assert_array_equal(want, np.asarray(b))


def test_stale_cache_detected(ckpt, tmp_path):
    import shutil

    d = str(tmp_path / "stale")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    load_checkpoint(path, convert_checkpoints=True)
    stem = os.path.splitext(path)[0]
    # remove the preferred packed caches so the per-leaf npz path runs
    for f in os.listdir(d):
        if ".packed." in f:
            os.remove(os.path.join(d, f))
    # corrupt the cache: drop a tensor
    with np.load(f"{stem}-head.npz") as z:
        arrays = {k: z[k] for k in z.files}
    arrays["a0000"] = arrays["a0000"][..., :1]
    with open(f"{stem}-head.npz", "wb") as f:
        np.savez(f, **arrays)
    with pytest.raises(LoaderError, match="stale cache"):
        load_checkpoint(path)


def test_missing_checkpoint_and_cache(tmp_path):
    with pytest.raises(LoaderError, match="no such file"):
        load_checkpoint(str(tmp_path / "nope.pt"))


def test_config_json_preferred_over_pt_reparse(ckpt, tmp_path, monkeypatch):
    """With part caches + config json present, a warm load must never
    re-parse the (multi-GB in production) .pt just to infer the config."""
    import shutil

    d = str(tmp_path / "warm")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    cfg1, _ = load_checkpoint(path, convert_checkpoints=True)

    import matrix_eyes_tpu.pt.loader as loader_mod

    def boom(*a, **k):
        raise AssertionError("warm load re-parsed the .pt")

    monkeypatch.setattr(loader_mod, "read_pt_state_dict", boom)
    cfg2, params = load_checkpoint(path)
    assert cfg2 == cfg1
    assert set(params) == {"encoder", "decoder", "head", "fov"}


def test_cache_written_f16_by_default(ckpt, tmp_path):
    """The on-disk cache convention is f16 regardless of runtime dtype
    (reference mod.rs:211-227); an f32 conversion must not double it."""
    import shutil
    import json

    d = str(tmp_path / "f16cache")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    load_checkpoint(path, dtype=jnp.float32, convert_checkpoints=True)
    stem = os.path.splitext(path)[0]
    with np.load(f"{stem}-encoder.npz") as z:
        manifest = json.loads(bytes(z["manifest"]).decode())
    assert all(dt == "float16" for dt in manifest["dtypes"]), manifest["dtypes"]
    # and loading casts back up to the requested dtype
    _, params = load_checkpoint(path, dtype=jnp.float32)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))


def test_packed_cache_roundtrip_and_preference(ckpt, tmp_path):
    """Packed blob path returns the same parameters as the per-leaf npz
    path and is preferred when both exist."""
    import shutil

    from matrix_eyes_tpu.pt.loader import load_packed_cache, load_part_cache

    d = str(tmp_path / "packed")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    cfg, p_fresh = load_checkpoint(path, dtype=jnp.float32, convert_checkpoints=True)
    stem = os.path.splitext(path)[0]
    assert os.path.exists(f"{stem}-encoder.packed.npy")
    assert os.path.exists(f"{stem}-encoder.packed.json")

    # remove the .pt: both cache formats must fully reconstruct
    os.remove(path)
    _, p_packed = load_checkpoint(path, dtype=jnp.float32)
    for a, b in zip(jax.tree.leaves(p_fresh), jax.tree.leaves(p_packed)):
        want = np.asarray(a, np.float32).astype(np.float16).astype(np.float32)
        np.testing.assert_array_equal(want, np.asarray(b))

    # stale packed manifest is detected
    import json as _json

    with open(f"{stem}-head.packed.json") as f:
        m = _json.load(f)
    m["entries"][0]["shape"][0] += 1
    with open(f"{stem}-head.packed.json", "w") as f:
        _json.dump(m, f)
    with pytest.raises(LoaderError, match="packed cache"):
        load_checkpoint(path, dtype=jnp.float32)


def test_truncated_packed_blob_is_loader_error(ckpt, tmp_path):
    import shutil

    d = str(tmp_path / "trunc_packed")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    load_checkpoint(path, convert_checkpoints=True)
    stem = os.path.splitext(path)[0]
    with open(f"{stem}-decoder.packed.npy", "r+b") as f:
        f.truncate(100)
    with pytest.raises(LoaderError, match="packed cache"):
        load_checkpoint(path)


def test_replaced_checkpoint_invalidates_caches(ckpt, tmp_path):
    # Replacing the .pt in place (different weights, same path) must not
    # silently serve the previous model's cached config/weights: the
    # config cache records the .pt's (size, mtime) at convert time.
    import shutil

    import numpy as np

    import torch

    import torch_ref
    from matrix_eyes_tpu.config import TINY

    d = str(tmp_path / "replace")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    _, p1 = load_checkpoint(path, dtype=jnp.float32, convert_checkpoints=True)

    # write a different-weight checkpoint at the same path (new mtime/size)
    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=99)
    torch.save(tm.state_dict(), path)

    _, p2 = load_checkpoint(path, dtype=jnp.float32)
    a = np.asarray(jax.tree.leaves(p1["head"])[0], np.float32)
    b = np.asarray(jax.tree.leaves(p2["head"])[0], np.float32)
    assert not np.allclose(a, b), "stale cached weights served after .pt replacement"


def test_place_part_chunks_large_uploads(monkeypatch):
    # The blob uploads are capped (a single multi-GB device_put failed
    # UNAVAILABLE through the device relay); chunked placement must be
    # exactly equivalent to one-blob placement.
    from matrix_eyes_tpu.pt.loader import _place_part

    rng = np.random.RandomState(0)
    tree = {f"w{i}": rng.randn(7, 11).astype(np.float32) for i in range(9)}
    tree["half"] = rng.randn(13).astype(np.float16)
    monkeypatch.setenv("MATRIX_EYES_MAX_UPLOAD_BYTES", "600")  # ~2 leaves/blob
    placed = _place_part(tree, jnp.float32)
    for k, v in tree.items():
        np.testing.assert_allclose(np.asarray(placed[k], np.float32),
                                   v.astype(np.float32), rtol=1e-6, atol=1e-6)


def test_symlinked_checkpoint_shares_caches(ckpt, tmp_path):
    # Caches live next to the REAL .pt: loading through a symlink must hit
    # the same caches instead of silently reconverting on every run.
    import shutil

    real_dir = tmp_path / "real"
    link_dir = tmp_path / "link"
    os.makedirs(real_dir), os.makedirs(link_dir)
    real = str(real_dir / "m.pt")
    shutil.copy(ckpt, real)
    link = str(link_dir / "m.pt")
    os.symlink(real, link)

    _, p1 = load_checkpoint(real, dtype=jnp.float32, convert_checkpoints=True)
    assert os.path.exists(str(real_dir / "m-head.npz"))

    # loading via the symlink finds them (and writes nothing next to the link)
    _, p2 = load_checkpoint(link, dtype=jnp.float32, convert_checkpoints=True)
    assert not any(f != "m.pt" for f in os.listdir(link_dir))
    # p1 is fresh from the f32 .pt; p2 went through the f16 on-disk cache
    # convention -- equal up to one f16 rounding
    a = np.asarray(jax.tree.leaves(p1["head"])[0], np.float32)
    b = np.asarray(jax.tree.leaves(p2["head"])[0], np.float32)
    np.testing.assert_array_equal(a.astype(np.float16), b.astype(np.float16))


def test_partial_parts_refresh_purges_other_caches(ckpt, tmp_path):
    # Replacing the .pt and reconverting only SOME parts must not leave the
    # other parts' caches (from the old checkpoint) stamped as fresh.
    import shutil
    import time

    d = str(tmp_path / "partial")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    _, old = load_checkpoint(path, dtype=jnp.float32, convert_checkpoints=True)

    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=99)
    torch.save(tm.state_dict(), path)
    now = time.time() + 10
    os.utime(path, (now, now))

    # Reconvert only the head (EXIF-focal runs never touch fov)
    load_checkpoint(path, dtype=jnp.float32, convert_checkpoints=True,
                    parts=("encoder", "decoder", "head"))
    # A later full load must serve NEW fov weights, not the old cache
    _, new = load_checkpoint(path, dtype=jnp.float32, convert_checkpoints=True)
    a = np.asarray(jax.tree.leaves(old["fov"])[0], np.float32)
    b = np.asarray(jax.tree.leaves(new["fov"])[0], np.float32)
    assert not np.allclose(a, b), "stale fov cache survived a partial refresh"


def test_readonly_checkpoint_dir_degrades_gracefully(ckpt, tmp_path):
    # A read-only real location (shared storage) must not crash conversion:
    # caches land next to the (writable) symlink instead.
    import shutil
    import stat

    ro_dir = tmp_path / "ro"
    link_dir = tmp_path / "rw"
    os.makedirs(ro_dir), os.makedirs(link_dir)
    real = str(ro_dir / "m.pt")
    shutil.copy(ckpt, real)
    os.chmod(ro_dir, stat.S_IRUSR | stat.S_IXUSR)
    try:
        if os.access(str(ro_dir), os.W_OK):  # running as root: chmod is moot
            from expected_skips import SKIP_ROOT_CANNOT_DROP_WRITE

            pytest.skip(SKIP_ROOT_CANNOT_DROP_WRITE)
        link = str(link_dir / "m.pt")
        os.symlink(real, link)
        _, p = load_checkpoint(link, dtype=jnp.float32, convert_checkpoints=True)
        assert jax.tree.leaves(p["head"])
        assert os.path.exists(str(link_dir / "m-config.json"))
        assert not os.path.exists(str(ro_dir / "m-config.json"))
    finally:
        os.chmod(ro_dir, stat.S_IRWXU)


def test_use_caches_false_bypasses_f16_convention(ckpt, tmp_path):
    # Parity probes need the .pt's f32 values exactly, even when f16
    # caches exist next to the checkpoint (and must not write any).
    import shutil

    d = str(tmp_path / "bypass")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    load_checkpoint(path, dtype=jnp.float32, convert_checkpoints=True)
    before = sorted(os.listdir(d))

    _, p = load_checkpoint(path, dtype=jnp.float32, use_caches=False,
                           convert_checkpoints=True)
    assert sorted(os.listdir(d)) == before, "use_caches=False wrote caches"
    leaf = np.asarray(jax.tree.leaves(p["head"])[0], np.float32)
    # f32 values that do NOT round-trip f16 exactly must survive
    assert not np.array_equal(leaf, leaf.astype(np.float16).astype(np.float32)) \
        or leaf.size < 4, "expected raw f32 values, got f16-rounded ones"
