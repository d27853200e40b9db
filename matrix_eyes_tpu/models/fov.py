"""Field-of-view (focal length) estimation head (reference src/depth_pro/fov.rs).

A third ViT-L instance runs on the image downsampled 1536 -> 384
(fov.rs:53-61); its tokens go through a linear 1024 -> 128, the cls token is
dropped and the rest folded to a (24, 24, 128) grid (fov.rs:63-67,74); a
strided conv of the decoder's lowres features is added (fov.rs:70-74); and a
small conv head reduces to a single scalar fov in degrees (fov.rs:77-87,
config fov.rs:101-116).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from matrix_eyes_tpu.config import ModelConfig
from matrix_eyes_tpu.models import vit
from matrix_eyes_tpu.ops import nn
from matrix_eyes_tpu.ops.resize import downsample_quarter

Params = Dict


def forward(
    cfg: ModelConfig,
    params: Params,
    x: jnp.ndarray,
    lowres_feature: jnp.ndarray,
    use_flash: bool = False,
) -> jnp.ndarray:
    """x: (B, 1536, 1536, 3) input image; lowres_feature: (B, 48, 48, 256)
    from the decoder. Returns the estimated fov in degrees, shape (B,).
    """
    s = cfg.tokens_per_side
    # The FOV scalar divides every output depth, so its relative error is a
    # floor on end-to-end accuracy -- and in bf16 the accumulated drift of a
    # third 24-block ViT shows up directly (~3-5% measured on the real
    # checkpoint). This network is ~3% of total FLOPs (one 384^2 tile vs the
    # patch encoder's 35), so run its activations in f32: parameters stay
    # bf16 in HBM (matmuls still hit the MXU with bf16 operands), while
    # accumulation, residuals and the conv head keep full precision.
    x = downsample_quarter(x.astype(jnp.float32))  # 1536 -> 384 (fov.rs:53)
    lowres_feature = lowres_feature.astype(jnp.float32)
    # Upcast at use (lax convs require matching operand dtypes); XLA fuses
    # the converts, params stay half precision in HBM, and the MXU still
    # sees bf16 operands at default matmul precision, so this costs ~3 ms
    # of extra HBM traffic, not matmul throughput.
    import jax

    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    tokens, _ = vit.forward_features(cfg, params["encoder"], x, use_flash=use_flash)
    tokens = nn.linear(tokens, params["linear"]["w"], params["linear"]["b"])
    # Drop cls, fold to NHWC grid. The reference (fov.rs:67,74) permutes to
    # channels-first and reshapes to [1, C, 24, 24]; the NHWC equivalent is a
    # plain (B, 24, 24, C) reshape of the token-major layout.
    feat = tokens[:, 1:, :].reshape(x.shape[0], s, s, -1)

    low = nn.conv2d(lowres_feature, params["downsample0"]["w"], params["downsample0"]["b"],
                    stride=2, padding=1)
    low = nn.relu(low)
    h = feat + low

    h = nn.conv2d(h, params["head0"]["w"], params["head0"]["b"], stride=2, padding=1)
    h = nn.relu(h)
    h = nn.conv2d(h, params["head1"]["w"], params["head1"]["b"], stride=2, padding=1)
    h = nn.relu(h)
    h = nn.conv2d(h, params["head2"]["w"], params["head2"]["b"])  # k6, valid
    return h.reshape(x.shape[0])
