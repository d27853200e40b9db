"""DPT-style multiresolution fusion decoder (reference src/depth_pro/decoder.rs).

Components:
* ResidualConvUnit (decoder.rs:14-45): x + conv3x3(relu(conv3x3(relu(x))));
* FeatureFusionBlock (decoder.rs:47-103): optional skip-add of RCU(skip),
  RCU, optional 2x2/s2 deconv upsample, 1x1 out conv;
* MultiresConvDecoder (decoder.rs:105-209): per-level 3x3 projections to the
  decoder width (the finest level's 1x1 is skipped when dims already match,
  decoder.rs:123-131), then fusion blocks processed coarse -> fine.

Returns (features, lowres_features): the finest fused grid (768^2@256) and
the coarsest projected grid (48^2@256) which feeds the FOV head
(decoder.rs:178, mod.rs:354).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from matrix_eyes_tpu.ops import nn

Params = Dict


def residual_conv_unit(p: Params, x: jnp.ndarray,
                       extra_skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """RCU (decoder.rs:35-44); ``extra_skip`` folds a caller-side residual
    (the fusion block's skip-add, decoder.rs:88) into the same epilogue."""
    from matrix_eyes_tpu.ops.conv3x3 import conv3x3_dispatch

    # fully fused RCU: both ReLUs run inside the conv kernels (VMEM
    # passes) and the skip-adds ride the second conv's epilogue -- the
    # naive form costs three materialised full-tensor passes (~2.2 ms at
    # 768^2 x 256) between the convs. conv3x3_dispatch returns None when
    # the kernel cannot run here (shape/VMEM/backend/mesh), including when
    # only the SECOND conv's skip configuration doesn't fit.
    h = conv3x3_dispatch(x, p["conv1_w"], p["conv1_b"], relu_in=True)
    if h is not None:
        out = conv3x3_dispatch(h, p["conv2_w"], p["conv2_b"], skip=x,
                               skip2=extra_skip, relu_in=True)
        if out is not None:
            return out
        out = nn.conv2d(nn.relu(h), p["conv2_w"], p["conv2_b"], padding=1)
        out = x + out
        return out if extra_skip is None else out + extra_skip
    out = nn.relu(x)
    out = nn.conv2d(out, p["conv1_w"], p["conv1_b"], padding=1)
    out = nn.relu(out)
    out = nn.conv2d(out, p["conv2_w"], p["conv2_b"], padding=1)
    out = x + out
    return out if extra_skip is None else out + extra_skip


def feature_fusion_block(p: Params, x0: jnp.ndarray,
                         x1: Optional[jnp.ndarray]) -> jnp.ndarray:
    out = x0
    if x1 is not None:
        out = residual_conv_unit(p["resnet1"], x1, extra_skip=x0)
    out = residual_conv_unit(p["resnet2"], out)
    if "deconv_w" in p:
        # The bias-free 2x2/s2 deconv (decoder.rs:65-68) and the 1x1 out
        # conv have no nonlinearity between them, so the 1x1 composes into
        # the deconv's matmul: (Ci, 4, Co) @ (Co, Cout) -> one matmul +
        # depth-to-space instead of two passes over the upsampled grid.
        wd = p["deconv_w"].astype(jnp.float32)        # (Ci, 4*Co)
        w1 = p["out_conv_w"].astype(jnp.float32)      # (Co, Cout)
        ci = wd.shape[0]
        co = wd.shape[1] // 4
        w = (wd.reshape(ci, 4, co) @ w1).reshape(ci, 4 * w1.shape[1])
        return nn.deconv2x2(out, w.astype(out.dtype), p["out_conv_b"])
    return nn.linear(out, p["out_conv_w"], p["out_conv_b"])  # 1x1 conv


def forward(params: Params, encodings: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decoder forward (decoder.rs:153-208).

    ``params['convs']`` has one 3x3 projection per encoding except the
    finest, which the encoder already produces at decoder width (see
    decoder_spec in models/spec.py).
    """
    convs = params["convs"]
    fusions = params["fusions"]
    if len(encodings) != len(fusions):
        raise ValueError(
            f"got encoder output levels {len(encodings)}, expected levels {len(fusions)}")

    features = nn.conv2d(encodings[-1], convs[-1]["w"], padding=1)
    lowres_features = features
    features = feature_fusion_block(fusions[-1], features, None)

    for i in range(len(encodings) - 2, -1, -1):
        enc = encodings[i]
        if i > 0:
            enc = nn.conv2d(enc, convs[i - 1]["w"], padding=1)
        features = feature_fusion_block(fusions[i], features, enc)

    return features, lowres_features
