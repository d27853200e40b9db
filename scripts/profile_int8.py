"""On-chip adopt/reject measurement for the int8 ViT linear path.

Times each of the four ViT block matmuls at the patch-encoder's production
shape (35 patches x 640 padded tokens) in bf16 vs int8 (including the
dynamic per-token quantization overhead), then a full transformer block
both ways. Run on the TPU:

    PYTHONPATH=. python scripts/profile_int8.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_timeit import timeit
from matrix_eyes_tpu.ops import nn
from matrix_eyes_tpu.ops.quant import qlinear, quantize_weight

B, N, C = 35, 640, 1024
M = B * N

SHAPES = {
    "qkv": (C, 3 * C),
    "proj": (C, C),
    "fc1": (C, 4 * C),
    "fc2": (4 * C, C),
}


def main():
    rng = np.random.default_rng(0)
    results = {}
    for name, (k, n) in SHAPES.items():
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(n,)) * 0.02, jnp.bfloat16)
        qw, ws = quantize_weight(w)
        x = jnp.asarray(rng.normal(size=(M, k)), jnp.bfloat16)

        t_bf = timeit(f"{name} bf16 {M}x{k}x{n}",
                      lambda xc, w=w, b=b: jnp.sum(
                          nn.linear(xc, w, b).astype(jnp.float32)), x, n=30)
        t_q = timeit(f"{name} int8 (dyn per-token quant)",
                     lambda xc, qw=qw, ws=ws, b=b: jnp.sum(
                         qlinear(xc, qw, ws, b).astype(jnp.float32)), x, n=30)
        results[name] = (t_bf, t_q)

    print()
    tot_bf = tot_q = 0.0
    for name, (t_bf, t_q) in results.items():
        tot_bf += t_bf
        tot_q += t_q
        print(f"{name:5s}: bf16 {t_bf:6.3f} ms | int8 {t_q:6.3f} ms | "
              f"delta {t_bf - t_q:+6.3f} ms")
    print(f"block matmuls total: bf16 {tot_bf:.3f} | int8 {tot_q:.3f} | "
          f"x24 blocks saves {(tot_bf - tot_q) * 24:.1f} ms/image")


def full_model():
    """Full production forward, bf16 vs the adopted int8 layout."""
    from matrix_eyes_tpu.config import DEPTH_PRO
    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models.init import init_params_fast
    from matrix_eyes_tpu.ops.quant import quantize_params_device

    S = lambda t: jnp.sum(t, dtype=jnp.float32)
    cfg = DEPTH_PRO
    rng = np.random.default_rng(0)
    params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
    qparams = jax.block_until_ready(quantize_params_device(params))
    img = jax.block_until_ready(jnp.asarray(
        rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3)), jnp.bfloat16))

    timeit("full model bf16 (+FOV)", lambda x: S(
        depth_pro.forward_with_fov.__wrapped__(cfg, params, x, True)[0]), img, n=20)
    timeit("full model int8 (+FOV)", lambda x: S(
        depth_pro.forward_with_fov.__wrapped__(cfg, qparams, x, True)[0]), img, n=20)


if __name__ == "__main__":
    main()
    full_model()
