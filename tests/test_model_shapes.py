"""Shape-flow tests for the full model stack on the TINY config."""

import jax.numpy as jnp
import numpy as np
import pytest

from matrix_eyes_tpu.config import TINY, DEPTH_PRO
from matrix_eyes_tpu.models import depth_pro, encoder, init, vit


@pytest.fixture(scope="module")
def tiny_params():
    return init.init_params(TINY, seed=0)


def test_config_constants_match_reference():
    # Production config must reproduce the reference architecture:
    # vit.rs:349-358, mod.rs:33, mod.rs:262-263, encoder.rs:227.
    assert DEPTH_PRO.img_size == 1536
    assert DEPTH_PRO.vit_img_size == 384
    assert DEPTH_PRO.seq_len == 577
    assert DEPTH_PRO.depth == 24
    assert DEPTH_PRO.num_heads == 16
    assert DEPTH_PRO.embed_dim == 1024
    assert DEPTH_PRO.encoder_feature_dims == (256, 512, 1024, 1024)
    assert DEPTH_PRO.decoder_features == 256
    assert DEPTH_PRO.highres_block_ids == (5, 11)


def test_split_counts():
    # 25 + 9 + 1 patch pyramid (encoder.rs:238-250).
    cfg = TINY
    x0 = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    x1 = jnp.zeros((1, cfg.img_size // 2, cfg.img_size // 2, 3))
    p0 = encoder.split(x0, cfg.vit_img_size, 4)
    p1 = encoder.split(x1, cfg.vit_img_size, 2)
    assert p0.shape[0] == 25
    assert p1.shape[0] == 9


def test_split_merge_roundtrip():
    # Merging feature grids of split patches reproduces a coherent grid:
    # build a ramp image, split, "encode" via 16x downsample-mean per patch
    # is too lossy; instead check merge of constant-per-patch grids tiles
    # correctly and output size is 4x token grid.
    cfg = TINY
    s = cfg.tokens_per_side
    tiles = jnp.arange(25, dtype=jnp.float32).reshape(25, 1, 1, 1)
    tiles = jnp.broadcast_to(tiles, (25, s, s, 1))
    merged = encoder.merge(tiles, 1, s // 8)
    assert merged.shape == (1, 4 * s, 4 * s, 1)
    # Corner tiles keep s - pad rows/cols; the merged grid's corners come
    # from tiles 0 and 24.
    np.testing.assert_allclose(np.asarray(merged)[0, 0, 0, 0], 0.0)
    np.testing.assert_allclose(np.asarray(merged)[0, -1, -1, 0], 24.0)


def test_vit_forward_shapes(tiny_params):
    cfg = TINY
    p = tiny_params["encoder"]["patch_encoder"]
    x = jnp.ones((2, cfg.vit_img_size, cfg.vit_img_size, 3))
    final, inters = vit.forward_features(cfg, p, x, intermediate_blocks=cfg.highres_block_ids)
    assert final.shape == (2, cfg.seq_len, cfg.embed_dim)
    assert len(inters) == 2
    assert all(i.shape == final.shape for i in inters)


def test_encoder_output_shapes(tiny_params):
    cfg = TINY
    x = jnp.ones((1, cfg.img_size, cfg.img_size, 3))
    encodings = encoder.forward_encodings(cfg, tiny_params["encoder"], x)
    s = cfg.tokens_per_side
    ef = cfg.encoder_feature_dims
    dec = cfg.decoder_features
    expected = [
        (1, 32 * s, 32 * s, dec),
        (1, 16 * s, 16 * s, ef[0]),
        (1, 8 * s, 8 * s, ef[1]),
        (1, 4 * s, 4 * s, ef[2]),
        (1, 2 * s, 2 * s, ef[3]),
    ]
    assert [e.shape for e in encodings] == expected


def test_full_model_with_fnorm(tiny_params):
    cfg = TINY
    x = jnp.ones((1, cfg.img_size, cfg.img_size, 3))
    inv = depth_pro.extract_depth(cfg, tiny_params, x[0], f_norm=0.7)
    assert inv.shape == (cfg.img_size, cfg.img_size)
    a = np.asarray(inv)
    assert np.all(a >= 1e-4) and np.all(a <= 1e4)
    assert np.all(np.isfinite(a))


def test_full_model_with_fov(tiny_params):
    cfg = TINY
    x = jnp.ones((2, cfg.img_size, cfg.img_size, 3))
    inv, fov_deg = depth_pro.forward_with_fov(cfg, tiny_params, x)
    assert inv.shape == (2, cfg.img_size, cfg.img_size)
    assert fov_deg.shape == (2,)
    assert np.all(np.isfinite(np.asarray(fov_deg)))
