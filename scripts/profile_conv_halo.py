"""A/B the conv kernel's 2-row halo stream (round-3) at the decoder's hot
shapes, against the round-2 record (full-R second stream: conv 4.95 ms,
decoder stage 34 ms — docs/PERFORMANCE.md).

Relay-safe methodology via scripts/tpu_timeit.py.

Usage: PYTHONPATH=.:scripts python scripts/profile_conv_halo.py
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
    from matrix_eyes_tpu.models import decoder
    from matrix_eyes_tpu.models.init import init_params_fast
    from matrix_eyes_tpu.ops.conv3x3 import conv3x3_pallas

    S = lambda t: jnp.sum(t, dtype=jnp.float32)
    cfg = DEPTH_PRO
    rng = np.random.RandomState(0)
    params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
    dp = params["decoder"]

    def mk(shape):
        return jax.block_until_ready(jnp.asarray(
            rng.uniform(-1, 1, shape).astype(np.float32), jnp.bfloat16))

    x768 = mk((1, 768, 768, 256))
    w = dp["fusions"][0]["resnet2"]["conv1_w"]
    b = dp["fusions"][0]["resnet2"]["conv1_b"]

    timeit("pallas conv3x3 256->256 @768^2 rows=4 (695 GF)",
           lambda x: S(conv3x3_pallas(x, w, b, rows=4)), x768)
    timeit("pallas conv3x3 256->256 @768^2 rows=6",
           lambda x: S(conv3x3_pallas(x, w, b, rows=6)), x768)
    timeit("pallas conv relu_in+skip @768^2 rows=4",
           lambda x: S(conv3x3_pallas(x, w, b, skip=x, relu_in=True, rows=4)), x768)
    timeit("pallas conv relu_in+skip @768^2 rows=2 (r2 pick)",
           lambda x: S(conv3x3_pallas(x, w, b, skip=x, relu_in=True, rows=2)), x768)
    timeit("RCU @768^2 (1390 GF)",
           lambda x: S(decoder.residual_conv_unit(dp["fusions"][0]["resnet2"], x)),
           x768)
    timeit("fusion[0] @768^2 (2857 GF)",
           lambda x: S(decoder.feature_fusion_block(dp["fusions"][0], x, x * 0.5)),
           x768)

    # full decoder stage at production encodings
    enc_shapes = [(1, 768, 768, 256), (1, 384, 384, 256), (1, 192, 192, 512),
                  (1, 96, 96, 1024), (1, 48, 48, 1024)]
    encs = [mk(s) for s in enc_shapes]

    def dec_body(x):
        e = [x] + encs[1:]
        f, lo = decoder.forward(dp, e)
        return S(f) + S(lo)

    timeit("decoder full stage (round-2 record: 34 ms)", dec_body, x768)


if __name__ == "__main__":
    main()
