"""One-process TPU profile: peak matmul, attention kernel, model stages.

All measurements run the iteration loop on device (single dispatch per
measurement, relay/tunnel latency amortised) and subtract the cost of the
per-iteration input perturbation (measured with an identity body), so the
reported number is the body alone.  Prints progressively.

Usage: python scripts/profile_full.py [n_iter] [sections]
  sections: comma-set of {peak,attn,block,stages}; default all
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_ITER = int(sys.argv[1]) if len(sys.argv) > 1 else 30
SECTIONS = set((sys.argv[2] if len(sys.argv) > 2 else
                "peak,attn,block,stages").split(","))


def _loop(body, x):
    @jax.jit
    def run_n(x, seed0):
        def it(i, acc):
            xi = x * (jnp.float32(1.0) + (seed0 + i.astype(jnp.float32)) * 1e-6).astype(x.dtype)
            return acc + body(xi)

        return jax.lax.fori_loop(0, N_ITER, it, jnp.float32(0.0))

    _ = np.asarray(run_n(x, jnp.float32(0.0)))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(run_n(x, jnp.float32(1.0)))
    return (time.perf_counter() - t0) / N_ITER * 1000


def timed(label, body, x):
    base = _loop(lambda xi: jnp.sum(xi[0, :8, :128].astype(jnp.float32)), x)
    t = _loop(body, x) - base
    print(f"{label:46s} {t:8.3f} ms  (perturb overhead {base:.3f})", flush=True)
    return t


def main():
    S = lambda t: jnp.sum(t, dtype=jnp.float32)
    rng = np.random.RandomState(0)

    # --- 1. peak matmul on this chip -------------------------------------
    if "peak" in SECTIONS:
        peak_section(S, rng)
    if "attn" in SECTIONS:
        attn_section(S, rng)
    if "block" in SECTIONS or "stages" in SECTIONS:
        model_sections(S, rng)


def peak_section(S, rng):
    a = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)).astype(np.float32), jnp.bfloat16)
    a = jax.block_until_ready(a.reshape(1, 4096, 4096))
    t = timed("matmul 4096^3 bf16 (137.4 GF)", lambda x: S(
        jnp.dot(x[0], x[0], preferred_element_type=jnp.float32)), a)
    print(f"  -> achieved {137.4 / t:.0f} TFLOPS", flush=True)


def attn_section(S, rng):
    from matrix_eyes_tpu.ops.flash_attention import attention_flash_qkv

    B, N, H, D = 35, 640, 16, 64
    C = H * D
    scale = 1.0 / (D ** 0.5)
    qkv = jnp.asarray(rng.uniform(-1, 1, (B, N, 3 * C)).astype(np.float32), jnp.bfloat16)
    qkv = jax.block_until_ready(qkv)
    t = timed("attention_flash_qkv (1 block)", lambda x: S(
        attention_flash_qkv(x, H, scale, n_valid=577)), qkv)
    print(f"  x24 blocks = {24 * t:.1f} ms/image; MXU time floor 0.298 ms/block",
          flush=True)


def model_sections(S, rng):
    from matrix_eyes_tpu.config import DEPTH_PRO
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params_fast

    cfg = DEPTH_PRO
    params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
    penc = params["encoder"]["patch_encoder"]
    blk0 = {k: v[0] for k, v in penc["blocks"].items()}
    B, N, C = 35, 640, cfg.embed_dim
    if "block" in SECTIONS:
        xtok = jnp.asarray(rng.uniform(-1, 1, (B, N, C)).astype(np.float32), jnp.bfloat16)
        xtok = jax.block_until_ready(xtok)
        t = timed("one ViT block (ln+qkv+attn+proj+mlp)", lambda x: S(
            vit.block_forward(cfg, blk0, x, use_flash=True, n_valid=577)), xtok)
        print(f"  x24 blocks = {24 * t:.1f} ms/image; matmul-only floor ~3.2 ms/block",
              flush=True)
    if "stages" not in SECTIONS:
        return

    # --- 4. model stages --------------------------------------------------
    from matrix_eyes_tpu.models import decoder, depth_pro, encoder

    img = jnp.asarray(rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3))
                      .astype(np.float32), jnp.bfloat16)
    img = jax.block_until_ready(img)

    t_enc = timed("encoder (pyramid + 2 ViTs + upsamples)", lambda x: S(sum(
        S(e) for e in encoder.forward_encodings(cfg, params["encoder"], x, True))), img)

    def encdec(x):
        encs = encoder.forward_encodings(cfg, params["encoder"], x, True)
        feats, low = decoder.forward(params["decoder"], encs)
        return S(feats) + S(low)

    t_dec = timed("encoder + decoder", encdec, img)

    t_full = timed("full model (fnorm given)", lambda x: S(
        depth_pro.forward_with_fnorm.__wrapped__(cfg, params, x, jnp.float32(0.7), True)), img)

    t_fov = timed("full model (+FOV head)", lambda x: S(
        depth_pro.forward_with_fov.__wrapped__(cfg, params, x, True)[0]), img)

    print(f"\nstages: encoder {t_enc:.1f} | decoder +{t_dec - t_enc:.1f} | "
          f"head +{t_full - t_dec:.1f} | fov +{t_fov - t_full:.1f} | full {t_fov:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
