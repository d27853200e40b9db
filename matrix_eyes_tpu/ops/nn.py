"""Neural-net primitives in NHWC, formulated for the TPU MXU.

Layout conventions (chosen TPU-first; the checkpoint converter in
``matrix_eyes_tpu.pt.convert`` rewrites PyTorch layouts into these once, at
load time):

* activations: NHWC (channels on the 128-lane axis);
* ``conv2d`` weights: HWIO;
* ``linear`` weights: (in, out) so the op is ``x @ w + b``;
* ``deconv2x2`` (every transposed conv in Depth Pro is kernel 2, stride 2)
  weights: (in, 4*out) -- the op is a plain matmul followed by a
  depth-to-space reshuffle, which maps to the MXU exactly with no
  scatter/overlap logic (reference uses Burn ConvTranspose2d, e.g.
  encoder.rs:105-115, decoder.rs:63-69, mod.rs:71-81);
* ``patch_embed`` (conv k16 s16, vit.rs:193-223) weight: (patch*patch*3, embed)
  -- a space-to-depth reshape plus one matmul.

All matmuls accumulate in f32 (``preferred_element_type``) regardless of the
bf16/f16 parameter dtype.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

ACC_T = jnp.float32


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """y = x @ w (+ b); w is (in, out)."""
    y = jnp.dot(x, w, preferred_element_type=ACC_T)
    if b is not None:
        y = y + b.astype(ACC_T)
    return y.astype(x.dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LayerNorm over the last axis, statistics in f32."""
    xf = x.astype(ACC_T)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * scale.astype(ACC_T) + bias.astype(ACC_T)
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, matching torch nn.GELU / Burn gelu (vit.rs:121).

    Written as 0.5*x*(1 + erf(x/sqrt(2))) -- torch's exact formulation --
    rather than jax.nn.gelu's erfc variant: identical math, but XLA:TPU
    fuses this form cleanly (jax.nn.gelu's lowering materialises an f32
    copy of the 4x-wide MLP activation, ~12 ms/image at ViT-L x35 scale).
    """
    xf = x.astype(ACC_T)
    y = xf * 0.5 * (1.0 + lax.erf(xf * 0.7071067811865476))
    return y.astype(x.dtype)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """2D convolution, NHWC activations, HWIO weights, f32 accumulation.

    On TPU, 3x3/s1/p1 convolutions with lane-aligned channels (the
    decoder's and head's hot shapes) dispatch to the Pallas shifted-matmul
    kernel (ops/conv3x3.py), measured ~10% faster than XLA's conv lowering
    at 768^2 x 256; everything else takes XLA's lowering, which round 1
    measured as the best formulation for the general case."""
    if stride == 1 and padding == 1:
        from matrix_eyes_tpu.ops.conv3x3 import conv3x3_dispatch

        y = conv3x3_dispatch(x, w, b)
        if y is not None:
            return y
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=ACC_T,
    )
    if b is not None:
        y = y + b.astype(ACC_T)
    return y.astype(x.dtype)


def deconv2x2(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transposed conv, kernel 2x2, stride 2, as matmul + depth-to-space.

    With stride == kernel there is no output overlap, so
    ``out[2i+di, 2j+dj, o] = sum_c x[i, j, c] * w[c, (di*2+dj)*Co + o]``:
    one MXU matmul and a reshuffle. ``w`` is (Ci, 4*Co).
    """
    B, H, W, Ci = x.shape
    Co = w.shape[1] // 4
    y = jnp.dot(x, w, preferred_element_type=ACC_T)  # (B,H,W,4*Co)
    if b is not None:
        y = y + jnp.tile(b.astype(ACC_T), 4)
    y = y.reshape(B, H, W, 2, 2, Co)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (B,H,2,W,2,Co)
    return y.reshape(B, 2 * H, 2 * W, Co).astype(x.dtype)


def patch_embed(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Non-overlapping patch embedding (conv k=s=patch) as one matmul.

    x: (B, H, W, C) with H, W divisible by ``patch``; w: (patch*patch*C, D)
    with the input axis ordered (ph, pw, c); returns (B, H/p * W/p, D) tokens
    in row-major patch order, matching vit.rs:209-223 (flatten then
    transpose).
    """
    B, H, W, C = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, ph, pw, C)
    x = x.reshape(B, gh * gw, patch * patch * C)
    return linear(x, w, b)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, jnp.zeros((), dtype=x.dtype))
