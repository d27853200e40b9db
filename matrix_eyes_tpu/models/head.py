"""Depth head (reference src/depth_pro/mod.rs:51-98, forward mod.rs:307-334).

conv 3x3 (C -> C/2) -> deconv 2x2/s2 (C/2 -> C/2) -> conv 3x3 (C/2 -> 32)
-> ReLU -> conv 1x1 (32 -> 1) -> ReLU; output is the canonical inverse
depth at full resolution (1536^2 for the production config).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from matrix_eyes_tpu.ops import nn

Params = Dict


def forward(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    """features: (B, H, W, C) decoder output; returns (B, 2H, 2W, 1)."""
    x = nn.conv2d(features, params["conv0_w"], params["conv0_b"], padding=1)
    x = nn.deconv2x2(x, params["deconv1_w"], params["deconv1_b"])
    x = nn.conv2d(x, params["conv2_w"], params["conv2_b"], padding=1)
    x = nn.relu(x)
    x = nn.linear(x, params["conv3_w"], params["conv3_b"])  # 1x1 conv
    return nn.relu(x)
