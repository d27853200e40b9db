"""Depth head (reference src/depth_pro/mod.rs:51-98, forward mod.rs:307-334).

conv 3x3 (C -> C/2) -> deconv 2x2/s2 (C/2 -> C/2) -> conv 3x3 (C/2 -> 32)
-> ReLU -> conv 1x1 (32 -> 1) -> ReLU; output is the canonical inverse
depth at full resolution (1536^2 for the production config).

TPU formulation: deconv1 and conv2 have no nonlinearity between them
(mod.rs:317-323 -- the first ReLU comes after conv2), so they compose into
ONE 3x3 convolution on the half-resolution grid with 128 -> 4*32 channels,
emitting all four output-pixel phases as channels, followed by a
depth-to-space shuffle.  Measured on v5e this matters a lot: conv2 run
naively at 1536^2 with 32 output channels fills a quarter of the MXU's
128 output lanes at the model's largest spatial extent (9.5 ms, 18
TFLOP/s); the composed conv is a 128->128-channel 3x3 at 768^2 (MXU-shaped,
~1.7 ms).  The deconv bias is folded in exactly -- including conv2's
zero-padding boundary behaviour -- by routing it through an extra
always-one input channel that is zero-padded like every other channel.
The composition is done with jnp ops inside the forward (tiny: ~19 MFLOP),
so the checkpoint layout is unchanged and every backend/dtype shares it.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.ops import nn

Params = Dict


def _compose_deconv_conv(params: Params):
    """Compose deconv1 (2x2/s2) with conv2 (3x3/p1) into one 3x3 conv.

    Returns (w, b): w is (3, 3, Ci + 1, 4 * O) HWIO over the 768^2 grid --
    input channel Ci is the ones-channel carrying the deconv bias -- and
    b is the (4 * O,) phase-tiled conv2 bias.  Output channels are ordered
    (a, b, o) to match ``nn.deconv2x2``'s depth-to-space convention.

    Derivation: deconv output at row 2i + r is ``x[i] @ Wd[:, (r, s), :]``;
    conv2 at output row Y = 2i + a reads rows Y + u - 1 = 2(i + di) + r
    with t = a + u - 1, di = floor(t / 2), r = t mod 2.  Each (a, u) pair
    therefore contributes ``Wd[:, (r, s), :] @ W2[u, v]`` to composite tap
    (di, dj) of output phase (a, b).
    """
    f32 = jnp.float32
    wd = params["deconv1_w"].astype(f32)   # (Ci, 4*Cd)
    bd = params["deconv1_b"].astype(f32)   # (Cd,)
    w2 = params["conv2_w"].astype(f32)     # (3, 3, Cd, O)
    b2 = params["conv2_b"].astype(f32)     # (O,)
    ci = wd.shape[0]
    cd = wd.shape[1] // 4
    o = w2.shape[3]
    wd = wd.reshape(ci, 2, 2, cd)          # (cin, r, s, cd)

    comp = jnp.zeros((3, 3, ci + 1, 2, 2, o), f32)
    for a in (0, 1):
        for u in (0, 1, 2):
            t = a + u - 1
            di, r = t // 2, t % 2          # python floor semantics: t=-1 -> (-1, 1)
            for b in (0, 1):
                for v in (0, 1, 2):
                    tj = b + v - 1
                    dj, s = tj // 2, tj % 2
                    tap = wd[:, r, s, :] @ w2[u, v]            # (cin, O)
                    bias_tap = bd @ w2[u, v]                   # (O,)
                    comp = comp.at[di + 1, dj + 1, :ci, a, b].add(tap)
                    comp = comp.at[di + 1, dj + 1, ci, a, b].add(bias_tap)
    w = comp.reshape(3, 3, ci + 1, 4 * o)
    b = jnp.tile(b2, 4)
    return w, b


def forward(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    """features: (B, H, W, C) decoder output; returns (B, 2H, 2W, 1)."""
    x = nn.conv2d(features, params["conv0_w"], params["conv0_b"], padding=1)

    w, b = _compose_deconv_conv(params)
    B, H, W, Ci = x.shape
    ones = jnp.ones((B, H, W, 1), x.dtype)
    y = nn.conv2d(jnp.concatenate([x, ones], axis=-1), w.astype(x.dtype),
                  b, padding=1)                       # (B, H, W, 4*O)
    O = y.shape[-1] // 4

    # ReLU + the 1x1 conv3 stay in phase space: per-phase application is a
    # block-diagonal (4*O, 4) matmul, so the depth-to-space shuffle moves a
    # 4-channel tensor instead of a 32-channel one (whose 1536^2 tensor is
    # lane-padded 32 -> 128 in HBM -- measured ~3 ms of pure layout traffic).
    w3 = params["conv3_w"].astype(jnp.float32)        # (O, 1)
    w3_blk = jax.scipy.linalg.block_diag(*([w3] * 4)).astype(x.dtype)  # (4*O, 4)
    y = nn.linear(nn.relu(y), w3_blk, jnp.tile(params["conv3_b"], 4))  # (B, H, W, 4)
    y = nn.relu(y)
    y = y.reshape(B, H, W, 2, 2, 1).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * H, 2 * W, 1)              # depth-to-space


def forward_unfused(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    """Reference formulation (stage-by-stage, mod.rs:307-334); used by the
    numerics tests as the ground truth for the fused composition."""
    x = nn.conv2d(features, params["conv0_w"], params["conv0_b"], padding=1)
    x = nn.deconv2x2(x, params["deconv1_w"], params["deconv1_b"])
    x = nn.conv2d(x, params["conv2_w"], params["conv2_b"], padding=1)
    x = nn.relu(x)
    x = nn.linear(x, params["conv3_w"], params["conv3_b"])  # 1x1 conv
    return nn.relu(x)
