"""bf16 inference accuracy: the TPU-default precision must stay close to f32.

The north-star accuracy budget is < 1% relative depth error vs PyTorch
(BASELINE.md); bf16 rounding must fit inside it. Checked on the TINY config
on CPU (same kernels, same cast points as the TPU path).
"""

import numpy as np

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import TINY
from matrix_eyes_tpu.models import depth_pro
from matrix_eyes_tpu.models.init import init_params


def test_bf16_depth_close_to_f32():
    cfg = TINY
    params32 = init_params(cfg, seed=9, dtype=jnp.float32)
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)
    rng = np.random.RandomState(0)
    img = rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3)).astype(np.float32)

    inv32 = depth_pro.forward_with_fnorm(cfg, params32, jnp.asarray(img), jnp.float32(0.7))
    inv16 = depth_pro.forward_with_fnorm(
        cfg, params16, jnp.asarray(img, jnp.bfloat16), jnp.float32(0.7))

    a32 = np.asarray(inv32)
    a16 = np.asarray(inv16, dtype=np.float32)
    rel = np.abs(a16 - a32) / np.maximum(np.abs(a32), 1e-2)
    # Random weights are far worse conditioned than trained ones (activations
    # sit near ReLU boundaries), so this is a regression bound rather than
    # the production accuracy budget: mean a few %, no blow-ups.
    assert rel.mean() < 0.05, rel.mean()
    # isolated pixels at ReLU zero-crossings can have huge *relative* error
    # with random weights; bound the bulk of the distribution instead
    assert np.quantile(rel, 0.99) < 0.25, np.quantile(rel, 0.99)
    assert np.isfinite(a16).all()


def test_f16_path_runs():
    # the reference's f16 builds are a supported dtype here too
    cfg = TINY
    params = init_params(cfg, seed=9, dtype=jnp.float16)
    rng = np.random.RandomState(1)
    img = rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3)).astype(np.float16)
    inv = depth_pro.forward_with_fnorm(cfg, params, jnp.asarray(img), jnp.float32(0.7))
    assert np.isfinite(np.asarray(inv)).all()


def test_f32_dtype_sets_highest_matmul_precision(monkeypatch):
    # XLA's DEFAULT precision rounds f32 matmul inputs to bf16 on the MXU;
    # the reference-grade --dtype f32 path must request the true-f32
    # multi-pass decomposition. Half-precision dtypes leave it alone.
    from matrix_eyes_tpu.config import configure_matmul_precision

    before = jax.config.jax_default_matmul_precision
    try:
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        jax.config.update("jax_default_matmul_precision", None)
        configure_matmul_precision(jnp.bfloat16)
        assert jax.config.jax_default_matmul_precision is None
        configure_matmul_precision(jnp.float16)
        assert jax.config.jax_default_matmul_precision is None
        configure_matmul_precision(jnp.float32)
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", before)
