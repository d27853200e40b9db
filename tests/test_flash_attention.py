"""Pallas flash-attention kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from matrix_eyes_tpu.ops.attention import attention_xla
from matrix_eyes_tpu.ops.flash_attention import attention_flash


@pytest.mark.parametrize("shape", [
    (1, 2, 577, 64),   # production token count
    (2, 4, 65, 32),    # off-lane sizes exercise the padding path
    (1, 1, 128, 64),   # exact multiple, no padding
])
def test_flash_matches_xla(shape):
    rng = np.random.RandomState(0)
    B, H, N, D = shape
    q = jnp.asarray(rng.uniform(-1, 1, size=shape).astype(np.float32))
    k = jnp.asarray(rng.uniform(-1, 1, size=shape).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1, 1, size=shape).astype(np.float32))
    scale = 1.0 / D ** 0.5
    want = attention_xla(q, k, v, scale)
    got = attention_flash(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("N", [
    128,   # lane-aligned: no overhang, no masking
    70,    # unaligned: the block overhangs the array; OOB k/v rows are
           # zero-masked in-kernel (interpret mode pads blocks with
           # unspecified values too, so this exercises the real contract)
    130,   # unaligned, > 1 lane: overhang after a full 128-row lane
])
def test_flash_qkv_matches_xla(N):
    # fused-layout kernel: heads read straight out of the (B, N, 3C) buffer
    from matrix_eyes_tpu.ops.flash_attention import attention_flash_qkv, qkv_fusable

    B, H, D = 3, 4, 64
    assert qkv_fusable(H, D)
    C = H * D
    rng = np.random.RandomState(5)
    qkv = jnp.asarray(rng.uniform(-1, 1, (B, N, 3 * C)).astype(np.float32))
    got = attention_flash_qkv(qkv, H, 0.125, interpret=True)  # (B, N, C)

    q, k, v = (qkv[..., i * C:(i + 1) * C].reshape(B, N, H, D).transpose(0, 2, 1, 3)
               for i in range(3))
    want = attention_xla(q, k, v, 0.125).transpose(0, 2, 1, 3).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_vit_flash_path_matches_xla_path():
    # the whole ViT with once-padded tokens + masked flash kernel must match
    # the unpadded XLA path
    from jax.experimental.pallas import tpu as pltpu

    from matrix_eyes_tpu.config import TINY
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params

    cfg = TINY
    p = init_params(cfg, seed=3)["encoder"]["patch_encoder"]
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(-1, 1, (2, cfg.vit_img_size, cfg.vit_img_size, 3))
                    .astype(np.float32))
    ref_final, ref_inters = vit.forward_features(cfg, p, x, cfg.highres_block_ids,
                                                 use_flash=False)
    with pltpu.force_tpu_interpret_mode():
        got_final, got_inters = vit.forward_features(cfg, p, x, cfg.highres_block_ids,
                                                     use_flash=True)
    np.testing.assert_allclose(np.asarray(got_final), np.asarray(ref_final),
                               rtol=2e-5, atol=2e-6)
    for g, r in zip(got_inters, ref_inters):
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-6)


def test_flash_softmax_scale_position():
    # scale applied to scores (kernel) vs to q (xla path) must agree
    rng = np.random.RandomState(1)
    shape = (1, 2, 100, 16)
    q, k, v = (jnp.asarray(rng.uniform(-3, 3, size=shape).astype(np.float32))
               for _ in range(3))
    want = attention_xla(q, k, v, 0.25)
    got = attention_flash(q, k, v, 0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)
