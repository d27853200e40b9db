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
    # load from cache, casting bf16 cache -> f32
    cfg2, p2 = load_checkpoint(ckpt, dtype=jnp.float32)
    assert cfg2 == cfg1
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))


def test_stale_cache_detected(ckpt, tmp_path):
    import shutil

    d = str(tmp_path / "stale")
    os.makedirs(d)
    path = os.path.join(d, "m.pt")
    shutil.copy(ckpt, path)
    load_checkpoint(path, convert_checkpoints=True)
    stem = os.path.splitext(path)[0]
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
