"""DINOv2-style ViT-L/16 vision transformer (functional, scan-over-blocks).

Reference: src/depth_pro/vit.rs (Attention vit.rs:57-76, LayerScale
vit.rs:78-96, Mlp vit.rs:98-124, Block vit.rs:126-171, PatchEmbed
vit.rs:173-224, DinoVisionTransformer vit.rs:226-347, config
``dinov2l16_384_init`` vit.rs:349-358: depth 24, embed 1024, heads 16).

TPU-first design choices:
* the 24 transformer blocks are identical in structure, so their parameters
  are stacked along a leading axis and the layer loop is a ``lax.scan`` --
  one compiled block body instead of 24 unrolled ones (faster compiles, same
  runtime);
* ``forward_features`` must also return the activations after the highres
  intermediate blocks (vit.rs:297-326, ids [5, 11]); the scan is segmented
  at those block ids so only the needed intermediates are materialised;
* attention runs through the Pallas flash kernel on TPU (ops/attention.py).

LayerNorm epsilon: the Burn reference uses Burn's default 1e-5, but the
PyTorch Depth Pro checkpoint (timm DINOv2 ViT) was trained with eps=1e-6;
we use the checkpoint's value (config.ModelConfig.layer_norm_eps) since
numerical parity with PyTorch Depth Pro is the accuracy target.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from matrix_eyes_tpu.config import ModelConfig
from matrix_eyes_tpu.ops import nn
from matrix_eyes_tpu.ops.attention import attention

Params = Dict[str, jnp.ndarray]


def _flash_sharding(batch: int):
    """How the flash kernel may run for a ``batch``-row ViT instance:

    * ``True`` -- plain single-computation kernel (no sharded context);
    * ``(mesh, axis)`` -- run per-shard under shard_map (pure data-parallel
      mesh whose axis divides the batch, e.g. the padded 40-patch pyramid);
    * ``None`` -- flash not usable through THIS routing (a non-dividing
      batch like the B=1 image/FOV encoders would replicate the opaque
      kernel; an unregistered tensor-parallel layout splits qkv features
      mid-section) -- use XLA attention. Tensor parallelism with the
      registered head-group layout takes the separate _attention_tp path
      (see parallel.sharding._tp_permute_qkv), not this one.
    """
    from matrix_eyes_tpu.parallel.sharding import active_data_mesh, active_patch_context

    if active_patch_context() is None:
        return True
    dm = active_data_mesh()
    if dm is not None and batch % dm[0].shape[dm[1]] == 0:
        return dm
    return None


def _attention_qkv(qkv: jnp.ndarray, H: int, D: int, scale: float,
                   use_flash: bool, n_valid: int | None) -> jnp.ndarray:
    """Attention on a checkpoint-layout (B, N, 3C) qkv (the non-TP paths,
    float and int8 alike): the fused Pallas kernel reads heads straight out
    of the qkv layout -- no (3, B, H, N, D) transpose, no head-merge after.
    The token axis arrives padded per the carry-dtype policy (sublane-
    aligned 592 for a bf16 carry, lane-aligned 640 for f32; see
    forward_features): the kernel sublane-rounds its own block and masks
    keys past ``n_valid`` (ops/flash_attention.py), so no lane-multiple
    padding is required here. _flash_sharding decides whether the kernel must be shard_mapped over a
    data-parallel mesh (a pallas_call is opaque to the GSPMD partitioner,
    so inside a sharded computation it cannot sit bare); where the geometry
    or context rules the kernel out, XLA attention takes over."""
    from matrix_eyes_tpu.ops.flash_attention import attention_flash_qkv, qkv_fusable

    B, N, C3 = qkv.shape
    if use_flash and qkv_fusable(H, D):
        data_mesh = _flash_sharding(B)
        if data_mesh not in (None, True):
            from jax.sharding import PartitionSpec as P

            from matrix_eyes_tpu.parallel.compat import shard_map

            mesh, axis = data_mesh
            return shard_map(
                lambda q: attention_flash_qkv(q, H, scale, n_valid=n_valid),
                mesh=mesh, in_specs=(P(axis, None, None),),
                out_specs=P(axis, None, None), check_rep=False)(qkv)
        return attention_flash_qkv(qkv, H, scale, n_valid=n_valid)
    q5 = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
    o = attention(q5[0], q5[1], q5[2], scale, use_flash=use_flash,
                  n_valid=n_valid)
    return o.transpose(0, 2, 1, 3).reshape(B, N, C3 // 3)


def _attention_tp(qkv: jnp.ndarray, tp_ctx, k_tp: int, H: int, D: int,
                  scale: float, use_flash: bool, n_valid: int | None):
    """Attention on the head-group-major TP qkv layout (see
    parallel.sharding._tp_permute_qkv): each model-axis shard holds the full
    [q|k|v] of its own H/k heads, so the fused Pallas kernel runs per shard
    under shard_map with a per-shard head count -- no extra collectives, and
    the (B, N, C) output's model-sharded feature axis is already in
    standard head order for the row-sharded proj."""
    from matrix_eyes_tpu.ops.attention import attention
    from matrix_eyes_tpu.ops.flash_attention import attention_flash_qkv, qkv_fusable

    B, N, C3 = qkv.shape
    C = C3 // 3
    H_loc = H // k_tp
    mesh, data_axis, model_axis, _ = tp_ctx

    if use_flash and qkv_fusable(H_loc, D):
        from jax.sharding import PartitionSpec as P

        from matrix_eyes_tpu.parallel.compat import shard_map

        bspec = data_axis if B % mesh.shape[data_axis] == 0 else None
        spec = P(bspec, None, model_axis)
        return shard_map(
            lambda q: attention_flash_qkv(q, H_loc, scale, n_valid=n_valid),
            mesh=mesh, in_specs=(spec,), out_specs=spec, check_rep=False)(qkv)

    # XLA attention on the permuted layout. The leading reshape axis k_tp
    # aligns with the GSPMD shard boundary of the qkv feature axis, so the
    # sharding propagates (head axis sharded) instead of resharding;
    # group-major head concatenation equals standard head order.
    q5 = (qkv.reshape(B, N, k_tp, 3, H_loc, D)
          .transpose(3, 0, 2, 4, 1, 5).reshape(3, B, H, N, D))
    o = attention(q5[0], q5[1], q5[2], scale, use_flash=False,
                  n_valid=n_valid)
    return o.transpose(0, 2, 1, 3).reshape(B, N, C)


def block_forward(cfg: ModelConfig, p: Params, x: jnp.ndarray, use_flash: bool,
                  n_valid: int | None = None) -> jnp.ndarray:
    """One pre-norm transformer block (vit.rs:163-170)."""
    H = cfg.num_heads
    D = cfg.head_dim
    scale = 1.0 / (D ** 0.5)

    # The residual carry x may be wider than the matmul compute dtype (the
    # f32-residual policy, see forward_features): branch inputs are cast to
    # the weights' dtype so every matmul stays on the MXU in bf16, while
    # the residual adds and LayerScale products run in the carry dtype
    # (cast explicitly before the multiply).
    from matrix_eyes_tpu.ops.quant import is_quantized_blocks

    quantized = is_quantized_blocks(p)
    if quantized:
        # int8 mode: the weights are int8, the activation compute dtype is
        # carried by the (unquantized) norm parameters.
        wdt = p["norm1_scale"].dtype
    else:
        wdt = (p["qkv_gw"] if "qkv_gw" in p else p["qkv_w"]).dtype
    h = nn.layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps)
    h = h.astype(wdt)

    if quantized:
        # int8 path (opt-in --dtype int8): qkv/fc1 run int8 on the MXU with
        # per-token dynamic activation quantization; proj/fc2 are
        # weight-only (dequantized here -- quantizing their activations
        # measured net-negative, ops/quant.py header). The qkv output is in
        # the compute dtype, so the flash kernel path below is unchanged.
        from matrix_eyes_tpu.ops.quant import dequantize_weight, qlinear

        if "qkv_gqw" in p:
            # head-group-major TP layout: the int8 columns (and their
            # per-output-channel scales) were permuted together by
            # parallel.sharding._tp_permute_qkv, so each model-axis shard
            # computes the complete int8 qkv of its own head group; the
            # dequantized output feeds the same per-shard attention path
            # as the float TP layout.
            from matrix_eyes_tpu.parallel.sharding import active_model_parallel

            tp_ctx = active_model_parallel()
            k_perm = p["qkv_gb"].shape[-2]  # degree the columns were permuted for
            if tp_ctx is None or tp_ctx[3] != k_perm or H % k_perm != 0:
                raise ValueError(
                    f"TP-grouped quantized qkv parameters (qkv_gqw, permuted "
                    f"for model-parallel degree {k_perm}) require the matching "
                    f"patch_sharded mesh context (active: "
                    f"{'none' if tp_ctx is None else tp_ctx[3]})")
            qkv = qlinear(h, p["qkv_gqw"], p["qkv_gsw"],
                          p["qkv_gb"].reshape(-1))
            o = _attention_tp(qkv, tp_ctx, tp_ctx[3], H, D, scale, use_flash,
                              n_valid)
        else:
            qkv = qlinear(h, p["qkv_qw"], p["qkv_sw"], p["qkv_b"])
            o = _attention_qkv(qkv, H, D, scale, use_flash, n_valid)
        o = nn.linear(o, dequantize_weight(p["proj_qw"], p["proj_sw"], wdt),
                      p["proj_b"])
        x = x + o.astype(x.dtype) * p["ls1"].astype(x.dtype)

        h = nn.layer_norm(x, p["norm2_scale"], p["norm2_bias"],
                          cfg.layer_norm_eps)
        h = qlinear(h.astype(wdt), p["fc1_qw"], p["fc1_sw"], p["fc1_b"])
        h = nn.gelu(h)
        h = nn.linear(h, dequantize_weight(p["fc2_qw"], p["fc2_sw"], wdt),
                      p["fc2_b"])
        return x + h.astype(x.dtype) * p["ls2"].astype(x.dtype)

    if "qkv_gw" in p:
        # head-group-major TP layout (parallel.sharding._tp_permute_qkv):
        # the layout is self-describing via the key, and only valid inside
        # the patch_sharded context of the mesh it was sharded for
        from matrix_eyes_tpu.parallel.sharding import active_model_parallel

        tp_ctx = active_model_parallel()
        k_perm = p["qkv_gb"].shape[-2]  # degree the columns were permuted for
        if tp_ctx is None or tp_ctx[3] != k_perm or H % k_perm != 0:
            raise ValueError(
                f"TP-grouped qkv parameters (qkv_gw, permuted for "
                f"model-parallel degree {k_perm}) require the matching "
                f"patch_sharded mesh context (active: "
                f"{'none' if tp_ctx is None else tp_ctx[3]})")
        qkv = nn.linear(h, p["qkv_gw"], p["qkv_gb"].reshape(-1))  # grouped
        o = _attention_tp(qkv, tp_ctx, tp_ctx[3], H, D, scale, use_flash,
                          n_valid)
    else:
        qkv = nn.linear(h, p["qkv_w"], p["qkv_b"])  # (B, N, 3C)
        o = _attention_qkv(qkv, H, D, scale, use_flash, n_valid)
    o = nn.linear(o, p["proj_w"], p["proj_b"])
    # cast BEFORE the LayerScale multiply: under the f32-residual policy a
    # bf16*bf16 product would round to bf16 before promotion into the f32
    # carry, re-adding the per-block rounding the policy exists to remove
    x = x + o.astype(x.dtype) * p["ls1"].astype(x.dtype)

    h = nn.layer_norm(x, p["norm2_scale"], p["norm2_bias"], cfg.layer_norm_eps)
    h = nn.linear(h.astype(wdt), p["fc1_w"], p["fc1_b"])
    h = nn.gelu(h)
    h = nn.linear(h, p["fc2_w"], p["fc2_b"])
    return x + h.astype(x.dtype) * p["ls2"].astype(x.dtype)


def prepare_tokens(cfg: ModelConfig, params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Patch-embed, prepend cls token, add positional embedding
    (vit.rs:287-295). x: (B, S, S, 3) NHWC; returns (B, N+1, C).

    Like the reference (vit.rs:278-285), positional-embedding interpolation
    is unsupported: the token count must match pos_embed exactly.
    """
    B = x.shape[0]
    tokens = nn.patch_embed(x, params["patch_embed"]["w"], params["patch_embed"]["b"],
                            cfg.patch_size)
    if tokens.shape[1] + 1 != params["pos_embed"].shape[1]:
        raise ValueError(
            f"pos_embed interpolation is not implemented: got {tokens.shape[1]} patch "
            f"tokens but pos_embed has {params['pos_embed'].shape[1] - 1}"
        )
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (B, 1, tokens.shape[2]))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    return tokens + params["pos_embed"].astype(tokens.dtype)


def _scan_blocks(cfg: ModelConfig, stacked: Params, x: jnp.ndarray, lo: int, hi: int,
                 use_flash: bool, n_valid: int | None = None) -> jnp.ndarray:
    """Run blocks [lo, hi) via lax.scan over their stacked parameters."""
    if hi <= lo:
        return x
    seg = {k: v[lo:hi] for k, v in stacked.items()}

    def body(carry, p):
        return block_forward(cfg, p, carry, use_flash, n_valid), None

    out, _ = lax.scan(body, x, seg)
    return out


def forward_features(
    cfg: ModelConfig,
    params: Params,
    x: jnp.ndarray,
    intermediate_blocks: Sequence[int] = (),
    use_flash: bool = False,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Full forward (vit.rs:328-346): returns the final LayerNorm'd token
    tensor and the (un-norm'd) activations after each block id in
    ``intermediate_blocks`` (must be sorted ascending).
    """
    tokens = prepare_tokens(cfg, params, x)
    seq = tokens.shape[1]

    if use_flash:
        from matrix_eyes_tpu.ops.flash_attention import flash_supported_dtype, qkv_fusable

        use_flash = flash_supported_dtype(tokens.dtype)
        if "qkv_gw" in params["blocks"] or "qkv_gqw" in params["blocks"]:
            # tensor-parallel head-group layout (self-describing via the
            # key): the fused kernel runs per shard with H/k heads (see
            # _attention_tp); requires the per-shard geometry to be
            # lane-alignable
            from matrix_eyes_tpu.parallel.sharding import active_model_parallel

            mp = active_model_parallel()
            k_perm = params["blocks"]["qkv_gb"].shape[-2]
            if mp is not None and mp[3] == k_perm and cfg.num_heads % k_perm == 0:
                use_flash = use_flash and qkv_fusable(
                    cfg.num_heads // k_perm, cfg.head_dim)
        else:
            fs = _flash_sharding(tokens.shape[0])
            if fs is None:
                use_flash = False  # sharded context the kernels cannot map over
            elif fs is not True:
                # data-parallel shard_map path: only the fused qkv kernel is
                # wrapped, so flash requires fusable head geometry here
                use_flash = use_flash and qkv_fusable(cfg.num_heads, cfg.head_dim)

    # f32 residual stream: the carry through the 24 blocks is where bf16
    # rounding ACCUMULATES (per-stage error attribution located the
    # canonical error tail here, not in the decoder/head); matmul inputs
    # are cast back down inside block_forward, so the MXU work is
    # unchanged. Outputs are returned in the original compute dtype.
    out_dt = tokens.dtype
    if cfg.vit_f32_residual and jnp.dtype(out_dt).itemsize < 4:
        tokens = tokens.astype(jnp.float32)

    # Token-axis padding policy (measured on v5e, docs/PERFORMANCE.md
    # round-3 token-alignment note). The flash kernel itself only needs a
    # SUBLANE-aligned (16-row) token count -- it takes the axis as one
    # block, and Mosaic pads the score tile to full lane tiles internally
    # either way -- so a bf16 carry pads 577 -> 592 (2.6% padded rows)
    # instead of 640 (10.9%) and saves ~0.2 ms/block of padded-row matmul
    # FLOPs (a raw unpadded 577 is NOT better: row-tile padding means the
    # matmuls compute 592 rows regardless, and unaligned layouts add
    # relayout copies on top). The f32 residual carry is the exception:
    # under lax.scan, XLA only fuses the f32 carry's cast/eltwise chain
    # cleanly when the token axis is a full LANE multiple -- 592/608/624
    # all measured ~2.5 ms/chain slower than 640 with an f32 carry, with
    # the isolated (non-scan) block showing the opposite ordering -- so
    # the f32 carry keeps the 128-multiple pad. Padded rows carry zeros;
    # the kernel masks keys past n_valid, so they are inert.
    n_valid = None
    if use_flash:
        align = 128 if tokens.dtype == jnp.float32 else 16
        if seq % align != 0:
            n_valid = seq
            tokens = jnp.pad(tokens, ((0, 0), (0, -seq % align), (0, 0)))

    stacked = params["blocks"]
    inters: List[jnp.ndarray] = []
    lo = 0
    for bid in intermediate_blocks:
        tokens = _scan_blocks(cfg, stacked, tokens, lo, bid + 1, use_flash, n_valid)
        inters.append(tokens[:, :seq, :].astype(out_dt))
        lo = bid + 1
    tokens = _scan_blocks(cfg, stacked, tokens, lo, cfg.depth, use_flash, n_valid)
    final = nn.layer_norm(tokens[:, :seq, :], params["norm"]["scale"],
                          params["norm"]["bias"], cfg.layer_norm_eps)
    return final.astype(out_dt), inters
