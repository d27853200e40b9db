"""TPU profile of the non-model bench-path pieces + encoder split.

Uses the low-noise tpu_timeit harness. Usage: python scripts/profile_pipeline.py
"""
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
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params_fast
    from matrix_eyes_tpu.ops.stereogram import stereogram_geometry, _synthesize
    from matrix_eyes_tpu.output.depthmap import _clamp_inverse_depth
    from matrix_eyes_tpu.pipeline import preprocess_image

    S = lambda t: jnp.sum(t, dtype=jnp.float32)
    cfg = DEPTH_PRO
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16

    src_h, src_w = 3024, 4032
    photo = jax.block_until_ready(jnp.asarray(
        rng.randint(0, 256, size=(src_h, src_w, 3), dtype=np.uint8)))
    timeit("preprocess (12MP lanczos3 + normalise)", lambda x: S(
        preprocess_image.__wrapped__(x.astype(jnp.uint8), cfg.img_size, dtype)),
        photo.astype(jnp.int32), n=20)

    inv = jax.block_until_ready(jnp.asarray(
        rng.uniform(0.01, 5.0, (cfg.img_size, cfg.img_size)).astype(np.float32)))
    dm, pw = stereogram_geometry(src_w, 1.0 / 16.0)
    key = jax.random.PRNGKey(0)

    timeit("clamp + stereogram synth (12MP out)", lambda x: S(
        _synthesize.__wrapped__(_clamp_inverse_depth.__wrapped__(x), key,
                                src_h, src_w, pw, dm).astype(jnp.uint32)),
        inv, n=20)

    params = jax.block_until_ready(init_params_fast(cfg, dtype=dtype))
    penc = params["encoder"]["patch_encoder"]
    patches = jax.block_until_ready(jnp.asarray(
        rng.uniform(-1, 1, (35, cfg.vit_img_size, cfg.vit_img_size, 3))
        .astype(np.float32), dtype))
    timeit("patch ViT alone (35x384^2, 24 blocks)", lambda x: S(
        vit.forward_features(cfg, penc, x, cfg.highres_block_ids, use_flash=True)[0]),
        patches, n=20)


if __name__ == "__main__":
    main()
