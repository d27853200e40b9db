"""Multi-scale pyramid encoder (reference src/depth_pro/encoder.rs).

Pipeline (encoder.rs:218-335):
  pyramid 1536/768/384 (bilinear) -> overlapping 384^2 patch split
  (25 + 9 + 1 = 35-patch batch) -> shared ViT-L patch encoder with highres
  intermediates after blocks [5, 11] -> overlap-trimmed merge back to
  feature grids -> per-scale projection+upsample chains -> low-res fusion
  with a separate ViT-L image encoder.

TPU-first notes:
* split/merge are pure static slice/concat ops -- XLA fuses them into the
  surrounding copies; nothing is data-dependent;
* the 35-patch batch is the natural sharding axis for multi-chip runs
  (see matrix_eyes_tpu.parallel): every patch is an independent ViT forward
  until the merge, which is where the all-gather lands;
* all upsample chains are 1x1 projections + 2x2/s2 transposed convs, i.e.
  pure matmuls (ops/nn.deconv2x2).

Patch split geometry scales with the config: stride = P - P/overlap_div
(encoder.rs:142-156); merge trims P_tokens/8 (or /4 for the half-res level)
feature pixels of overlap (encoder.rs:266-294: 3 and 6 for 24-token grids).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp

from matrix_eyes_tpu.config import ModelConfig
from matrix_eyes_tpu.models import vit
from matrix_eyes_tpu.ops import nn
from matrix_eyes_tpu.ops.resize import downsample_half, downsample_quarter

Params = Dict


def split(x: jnp.ndarray, patch: int, overlap_div: int) -> jnp.ndarray:
    """Split (B, S, S, C) into overlapping (patch x patch) tiles, stacked on
    the batch axis patch-major (encoder.rs:142-156): rows outer, cols inner,
    tile t covers [j*stride : j*stride+patch] x [i*stride : i*stride+patch].
    """
    stride = patch - patch // overlap_div
    size = x.shape[1]
    tiles = []
    for j in range(0, size - patch + 1, stride):
        for i in range(0, size - patch + 1, stride):
            tiles.append(x[:, j : j + patch, i : i + patch, :])
    return jnp.concatenate(tiles, axis=0)


def merge(x: jnp.ndarray, batch_size: int, padding: int) -> jnp.ndarray:
    """Inverse of split on feature grids (encoder.rs:158-189): trim
    ``padding`` feature pixels from interior tile edges and re-tile the
    (steps*steps*B, h, w, C) batch into (B, H, W, C).
    """
    b, h, w, c = x.shape
    steps = int((b // batch_size) ** 0.5)
    rows = []
    for j in range(steps):
        row = []
        for i in range(steps):
            idx = j * steps + i
            tile = x[batch_size * idx : batch_size * (idx + 1)]
            h0 = padding if j > 0 else 0
            h1 = h - padding if j < steps - 1 else h
            w0 = padding if i > 0 else 0
            w1 = w - padding if i < steps - 1 else w
            row.append(tile[:, h0:h1, w0:w1, :])
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def reshape_feature(cfg: ModelConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Drop the cls token and fold tokens to an NHWC grid (encoder.rs:191-208)."""
    b, n, c = tokens.shape
    s = cfg.tokens_per_side
    return tokens[:, 1:, :].reshape(b, s, s, c)


def _upsample_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 projection (no bias) + chain of bias-free 2x2/s2 deconvs
    (encoder.rs:85-118)."""
    x = nn.linear(x, p["proj"])  # 1x1 conv == matmul over channels
    for w in p["deconvs"]:
        x = nn.deconv2x2(x, w)
    return x


def forward_encodings(
    cfg: ModelConfig,
    params: Params,
    x: jnp.ndarray,
    use_flash: bool = False,
) -> List[jnp.ndarray]:
    """Full encoder forward (encoder.rs:218-335). x: (B, 1536, 1536, 3) NHWC.

    Returns 5 encodings (NHWC), finest to coarsest; for the production
    config: 768^2@256, 384^2@256, 192^2@512, 96^2@1024, 48^2@1024.
    """
    P = cfg.vit_img_size
    out_size = cfg.tokens_per_side
    pad_hi = out_size // 8
    pad_lo = out_size // 4
    batch_size = x.shape[0]

    # --- pyramid (encoder.rs:125-140) ---
    x0 = x
    x1 = downsample_half(x)
    x2 = downsample_quarter(x)

    # --- overlapping patch split (encoder.rs:142-156, 238-250) ---
    x0_patches = split(x0, P, 4)  # 25*B
    x1_patches = split(x1, P, 2)  # 9*B
    n0, n1 = x0_patches.shape[0], x1_patches.shape[0]
    pyramid = jnp.concatenate([x0_patches, x1_patches, x2], axis=0)  # 35*B

    # Multi-chip: annotate the patch batch with its mesh sharding, padding
    # 35 -> next multiple of the data axis (no-op outside a
    # parallel.patch_sharded context). XLA all-gathers at merge().
    from matrix_eyes_tpu.parallel.sharding import shard_patches

    pyramid, n_patches = shard_patches(pyramid)

    # --- shared patch encoder with highres intermediates (encoder.rs:252-256) ---
    encodings, highres = vit.forward_features(
        cfg, params["patch_encoder"], pyramid,
        intermediate_blocks=cfg.highres_block_ids, use_flash=use_flash,
    )
    encodings = encodings[:n_patches]
    highres0, highres1 = (h[:n_patches] for h in highres)

    enc_grid = reshape_feature(cfg, encodings)
    # highres intermediates come from the x0 patches only (the first n0
    # of the pyramid batch, encoder.rs:266-280); n0 tracks the split
    # geometry so a changed overlap divisor cannot desynchronise this
    latent0 = merge(reshape_feature(cfg, highres0)[: n0], batch_size, pad_hi)
    latent1 = merge(reshape_feature(cfg, highres1)[: n0], batch_size, pad_hi)

    x0_enc = enc_grid[:n0]
    x1_enc = enc_grid[n0 : n0 + n1]
    x2_enc = enc_grid[n0 + n1 :]
    x0_feat = merge(x0_enc, batch_size, pad_hi)
    x1_feat = merge(x1_enc, batch_size, pad_lo)
    x2_feat = x2_enc

    # --- separate global image encoder on the 384^2 level (encoder.rs:296-303) ---
    global_tokens, _ = vit.forward_features(
        cfg, params["image_encoder"], x2, use_flash=use_flash)
    global_feat = reshape_feature(cfg, global_tokens)

    # --- per-scale projection + upsample chains (encoder.rs:305-317) ---
    latent0 = _upsample_block(params["upsample_latent0"], latent0)
    latent1 = _upsample_block(params["upsample_latent1"], latent1)
    x0_feat = _upsample_block(params["upsample0"], x0_feat)
    x1_feat = _upsample_block(params["upsample1"], x1_feat)
    x2_feat = _upsample_block(params["upsample2"], x2_feat)

    # --- low-res fusion (encoder.rs:319-326) ---
    global_feat = nn.deconv2x2(global_feat, params["upsample_lowres"]["w"],
                               params["upsample_lowres"]["b"])
    fused = jnp.concatenate([x2_feat, global_feat], axis=-1)
    global_feat = nn.linear(fused, params["fuse_lowres"]["w"], params["fuse_lowres"]["b"])

    return [latent0, latent1, x0_feat, x1_feat, global_feat]
