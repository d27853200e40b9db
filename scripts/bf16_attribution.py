"""Per-stage bf16 error attribution at production scale (round-3 task:
shrink the canonical tail p99 5.8% -> <=2%).

Compares the bf16 pipeline against the f32 pipeline on the SAME random
full-size weights (seeded init_params), stage by stage, then probes hybrid
precision policies (selected stages promoted to f32) to find the cheapest
stage whose promotion fixes the canonical tail.

Run on the TPU:  PYTHONPATH=. python scripts/bf16_attribution.py [probe ...]
Probes: none | head | decoder | dec_head | dec_last
Emits one JSON line per result.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def rel_stats(got, want, floor=1e-2):
    g = np.asarray(got, np.float64)
    w = np.asarray(want, np.float64)
    r = np.abs(g - w) / np.maximum(np.abs(w), floor)
    return {"mean_rel": float(r.mean()), "p99_rel": float(np.percentile(r, 99)),
            "max_rel": float(r.max())}


def main():
    from matrix_eyes_tpu.config import DEPTH_PRO, enable_compilation_cache
    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models import fov as fov_mod
    from matrix_eyes_tpu.models.init import init_params

    enable_compilation_cache()
    cfg = DEPTH_PRO
    t0 = time.time()
    params32 = init_params(cfg, seed=7)
    params32 = jax.block_until_ready(params32)
    print(f"init {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3))
                      .astype(np.float32))

    def run(params, dtype, use_flash):
        @jax.jit
        def full(p, im):
            canonical, lowres = depth_pro.canonical_inverse_depth(
                cfg, p, im, use_flash)
            fov_deg = fov_mod.forward(cfg, p["fov"], im, lowres, use_flash)
            return canonical.astype(jnp.float32), fov_deg.astype(jnp.float32)

        canon, fov = full(params, img.astype(dtype))
        return np.asarray(canon), np.asarray(fov)

    canon32, fov32 = run(params32, jnp.float32, use_flash=False)
    print("f32 reference done", file=sys.stderr, flush=True)

    from matrix_eyes_tpu.models import decoder as decoder_mod
    from matrix_eyes_tpu.models import encoder as encoder_mod
    from matrix_eyes_tpu.models import head as head_mod

    cast16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)

    def run_hybrid(probe):
        """Full bf16 pipeline with selected stages promoted to f32
        (activations cast at the stage boundary, f32 weights -- the
        models/fov.py policy applied to other stages)."""
        f32_dec = probe in ("decoder", "dec_head")
        f32_head = probe in ("head", "dec_head")

        @jax.jit
        def full(p32, p16, im):
            encodings = encoder_mod.forward_encodings(
                cfg, p16["encoder"], im, True)
            if f32_dec:
                encodings = [e.astype(jnp.float32) for e in encodings]
            features, lowres = decoder_mod.forward(
                p32["decoder"] if f32_dec else p16["decoder"], encodings)
            if f32_head:
                features = features.astype(jnp.float32)
            canonical = head_mod.forward(
                p32["head"] if f32_head else p16["head"], features)[..., 0]
            fov_deg = fov_mod.forward(cfg, p16["fov"], im, lowres, True)
            return canonical.astype(jnp.float32), fov_deg.astype(jnp.float32)

        canon, fov = full(params32, cast16, img.astype(jnp.bfloat16))
        return np.asarray(canon), np.asarray(fov)

    probes = sys.argv[1:] or ["none", "head", "decoder", "dec_head"]
    for probe in probes:
        t0 = time.time()
        canon, fov = run_hybrid(probe)
        dt = time.time() - t0
        print(json.dumps({
            "probe": probe,
            "canonical": rel_stats(canon, canon32),
            "fov_abs_err": float(np.abs(fov - fov32).max()),
            "wall_s_first_call": round(dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
