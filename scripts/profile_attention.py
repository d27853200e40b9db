"""Micro-benchmark the fused qkv attention kernel at Depth Pro's shape.

Patch-ViT shape: B=35, N=640 (577 padded), H=16, D=64, 24 blocks.

Relay-safe AND tunnel-latency-safe methodology: the iteration loop runs
ON DEVICE (one ``fori_loop`` inside a single jitted call), each iteration
perturbing the input from the loop index so no step can be memoized, and
the call returns a data-dependent checksum. One dispatch measures N
iterations, so per-dispatch tunnel latency is amortised away.
Usage: python scripts/profile_attention.py [n_iter]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_ITER = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def timed(label, one_iter, x):
    """one_iter(x_perturbed) -> checksum scalar; loops N_ITER times on device."""

    @jax.jit
    def run_n(x, seed0):
        def body(i, acc):
            xi = x + (seed0 + i.astype(jnp.float32) * 1e-3).astype(x.dtype)
            return acc + one_iter(xi)

        return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

    _ = np.asarray(run_n(x, jnp.float32(0.0)))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(run_n(x, jnp.float32(1.0)))
    dt = (time.perf_counter() - t0) / N_ITER * 1000
    print(f"{label:44s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    from matrix_eyes_tpu.ops.flash_attention import attention_flash_qkv

    B, N, H, D = 35, 640, 16, 64
    C = H * D
    scale = 1.0 / (D ** 0.5)
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.uniform(-1, 1, (B, N, 3 * C)).astype(np.float32),
                      jnp.bfloat16)
    qkv = jax.block_until_ready(qkv)

    t = timed(
        "attention_flash_qkv (1 block)",
        lambda x: jnp.sum(attention_flash_qkv(x, H, scale, n_valid=577),
                          dtype=jnp.float32),
        qkv)
    print(f"  x24 blocks = {24 * t:.1f} ms/image (patch ViT attention)")

    q = jnp.asarray(rng.uniform(-1, 1, (B * H, N, D)).astype(np.float32), jnp.bfloat16)
    k = jax.block_until_ready(q + jnp.bfloat16(0.125))
    p = jnp.asarray(rng.uniform(0, 1, (B * H, N, N)).astype(np.float32), jnp.bfloat16)
    p = jax.block_until_ready(p)

    t1 = timed(
        "XLA batched q@k^T (D=64 contraction)",
        lambda x: jnp.sum(jax.lax.dot_general(
            x, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)),
        q)
    t2 = timed(
        "XLA batched p@v   (N=640 contraction)",
        lambda x: jnp.sum(jax.lax.dot_general(
            x, q, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)),
        p)
    print(f"  matmul floor = {24 * (t1 + t2):.1f} ms/image")

    flops = 2 * B * H * (2 * N * N * D)
    print(f"  per-block attention FLOPs: {flops / 1e9:.2f} GF; "
          f"at 197 TFLOPS: {flops / 197e9:.3f} ms")


if __name__ == "__main__":
    main()
