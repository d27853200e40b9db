"""Model-stage TPU profile using the low-noise tpu_timeit harness."""
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
    from matrix_eyes_tpu.models import decoder, depth_pro, encoder
    from matrix_eyes_tpu.models.init import init_params_fast

    S = lambda t: jnp.sum(t, dtype=jnp.float32)
    cfg = DEPTH_PRO
    rng = np.random.RandomState(0)
    params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
    img = jax.block_until_ready(jnp.asarray(
        rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3)).astype(np.float32),
        jnp.bfloat16))

    def encdec(x):
        encs = encoder.forward_encodings(cfg, params["encoder"], x, True)
        feats, low = decoder.forward(params["decoder"], encs)
        return S(feats) + S(low)

    t_enc = timeit("encoder", lambda x: S(sum(
        S(e) for e in encoder.forward_encodings(cfg, params["encoder"], x, True))),
        img, n=20)
    t_dec = timeit("encoder + decoder", encdec, img, n=20)
    t_fov = timeit("full model (+FOV)", lambda x: S(
        depth_pro.forward_with_fov.__wrapped__(cfg, params, x, True)[0]), img, n=20)
    print(f"decoder delta {t_dec - t_enc:.1f} | head+fov delta {t_fov - t_dec:.1f} "
          f"| full {t_fov:.1f}", flush=True)


if __name__ == "__main__":
    main()
