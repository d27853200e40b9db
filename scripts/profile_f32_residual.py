"""Cost A/B of the ViT f32-residual-stream policy (config.vit_f32_residual).

The policy buys back the bf16 canonical error tail (located in the
encoder's residual accumulation by scripts/bf16_attribution.py); this
measures what it costs at production scale: patch ViT alone and the full
forward, policy on vs off.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_f32_residual.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_timeit import timeit


def main():
    from matrix_eyes_tpu.config import DEPTH_PRO
    from matrix_eyes_tpu.models import depth_pro, vit
    from matrix_eyes_tpu.models.init import init_params_fast

    S = lambda t: jnp.sum(t, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    cfg_on = dataclasses.replace(DEPTH_PRO, vit_f32_residual=True)
    cfg_off = dataclasses.replace(DEPTH_PRO, vit_f32_residual=False)
    params = jax.block_until_ready(init_params_fast(cfg_on, dtype=jnp.bfloat16))
    penc = params["encoder"]["patch_encoder"]

    x35 = jax.block_until_ready(jnp.asarray(
        rng.uniform(-1, 1, (35, cfg_on.vit_img_size, cfg_on.vit_img_size, 3))
        .astype(np.float32), jnp.bfloat16))
    for cfg, tag in ((cfg_off, "off"), (cfg_on, "ON")):
        timeit(f"patch ViT 35x384^2 f32res={tag}",
               lambda x, c=cfg: S(vit.forward_features(
                   c, penc, x, c.highres_block_ids, use_flash=True)[0]), x35)

    img = jax.block_until_ready(jnp.asarray(
        rng.uniform(-1, 1, (1, cfg_on.img_size, cfg_on.img_size, 3))
        .astype(np.float32), jnp.bfloat16))
    for cfg, tag in ((cfg_off, "off"), (cfg_on, "ON")):
        timeit(f"full forward_with_fov f32res={tag}",
               lambda x, c=cfg: S(depth_pro.forward_with_fov.__wrapped__(
                   c, params, x, True)[0]), img, n=8)


if __name__ == "__main__":
    main()
