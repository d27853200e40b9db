"""Per-component TPU profile of the decoder and depth head.

Same relay-safe methodology as profile_full.py: on-device fori_loop, one
dispatch per measurement, perturbation overhead subtracted.

Usage: python scripts/profile_dechead.py [n_iter]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_ITER = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def _loop(body, x):
    @jax.jit
    def run_n(x, seed0):
        def it(i, acc):
            xi = x * (jnp.float32(1.0) + (seed0 + i.astype(jnp.float32)) * 1e-6).astype(x.dtype)
            return acc + body(xi)

        return jax.lax.fori_loop(0, N_ITER, it, jnp.float32(0.0))

    _ = np.asarray(run_n(x, jnp.float32(0.0)))
    t0 = time.perf_counter()
    _ = np.asarray(run_n(x, jnp.float32(1.0)))
    return (time.perf_counter() - t0) / N_ITER * 1000


def timed(label, body, x, gf=None):
    base = _loop(lambda xi: jnp.sum(xi[:1, :8, :8, :].astype(jnp.float32)), x)
    t = _loop(body, x) - base
    eff = f"  ({gf / t:.0f} TF/s)" if gf else ""
    print(f"{label:52s} {t:8.3f} ms{eff}", flush=True)
    return t


def main():
    from matrix_eyes_tpu.config import DEPTH_PRO
    from matrix_eyes_tpu.models import decoder, head
    from matrix_eyes_tpu.models.init import init_params_fast
    from matrix_eyes_tpu.ops import nn

    S = lambda t: jnp.sum(t, dtype=jnp.float32)
    cfg = DEPTH_PRO
    rng = np.random.RandomState(0)
    params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
    dp, hp = params["decoder"], params["head"]

    def mk(shape):
        return jax.block_until_ready(jnp.asarray(
            rng.uniform(-1, 1, shape).astype(np.float32), jnp.bfloat16))

    x768 = mk((1, 768, 768, 256))

    # single 3x3 conv at the decoder's finest level
    w = dp["fusions"][0]["resnet2"]["conv1_w"]
    b = dp["fusions"][0]["resnet2"]["conv1_b"]
    timed("conv3x3 256->256 @768^2 (695 GF)",
          lambda x: S(nn.conv2d(x, w, b, padding=1)), x768, gf=695)

    # residual conv unit (2 convs + relus + skip)
    timed("RCU @768^2 (1390 GF)",
          lambda x: S(decoder.residual_conv_unit(dp["fusions"][0]["resnet2"], x)),
          x768, gf=1390)

    # full finest fusion block (2 RCUs + out conv, no deconv)
    timed("fusion[0] @768^2 (2 RCU + 1x1, 2857 GF)",
          lambda x: S(decoder.feature_fusion_block(dp["fusions"][0], x, x * 0.5)),
          x768, gf=2857)

    # fusion[1] at 384^2 with deconv upsample
    x384 = mk((1, 384, 384, 256))
    timed("fusion[1] @384^2 (2 RCU + deconv + 1x1, ~793 GF)",
          lambda x: S(decoder.feature_fusion_block(dp["fusions"][1], x, x * 0.5)),
          x384, gf=793)

    # deconv alone at 384 -> 768
    if "deconv_w" in dp["fusions"][1]:
        dw = dp["fusions"][1]["deconv_w"]
        timed("deconv2x2 256->256 @384->768 (77 GF)",
              lambda x: S(nn.deconv2x2(x, dw)), x384, gf=77)

    # head stages
    timed("head conv0 3x3 256->128 @768^2 (347 GF)",
          lambda x: S(nn.conv2d(x, hp["conv0_w"], hp["conv0_b"], padding=1)),
          x768, gf=347)
    x768_128 = mk((1, 768, 768, 128))
    timed("head deconv1 2x2 128->128 @768->1536 (77 GF)",
          lambda x: S(nn.deconv2x2(x, hp["deconv1_w"], hp["deconv1_b"])),
          x768_128, gf=77)
    x1536_128 = mk((1, 1536, 1536, 128))
    timed("head conv2 3x3 128->32 @1536^2 (174 GF)",
          lambda x: S(nn.relu(nn.conv2d(x, hp["conv2_w"], hp["conv2_b"], padding=1))),
          x1536_128, gf=174)
    x1536_32 = mk((1, 1536, 1536, 32))
    timed("head conv3 1x1 32->1 @1536^2 + relu (0.3 GF)",
          lambda x: S(nn.relu(nn.linear(x, hp["conv3_w"], hp["conv3_b"]))),
          x1536_32)
    timed("head full (256 @768^2 -> 1 @1536^2, ~600 GF)",
          lambda x: S(head.forward(hp, x)), x768, gf=600)


if __name__ == "__main__":
    main()
