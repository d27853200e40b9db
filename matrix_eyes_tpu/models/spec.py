"""Parameter pytree specification for every Depth Pro part.

``param_spec(cfg)`` returns a nested structure of ``jax.ShapeDtypeStruct``
mirroring the parameter layouts consumed by models/*.py. It is the single
source of truth shared by:

* ``models.init`` -- random initialisation (tests, benchmarks);
* ``pt.convert`` -- checkpoint conversion validates every converted tensor
  against this spec and hard-errors on missing/mismatched entries, the
  behaviour of the reference loader (mod.rs:238-243).

Shape sources: ViT dinov2l16_384 (vit.rs:349-358), encoder upsample chains
(encoder.rs:37-118), decoder (decoder.rs:114-146), head (mod.rs:57-97), FOV
(fov.rs:94-128).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import ModelConfig


def _s(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(tuple(shape), dtype)


def vit_spec(cfg: ModelConfig) -> Dict[str, Any]:
    D = cfg.embed_dim
    L = cfg.depth
    P = cfg.patch_size
    M = cfg.mlp_ratio * D
    return {
        "patch_embed": {"w": _s((P * P * 3, D)), "b": _s((D,))},
        "cls_token": _s((1, 1, D)),
        "pos_embed": _s((1, cfg.seq_len, D)),
        "blocks": {
            "norm1_scale": _s((L, D)),
            "norm1_bias": _s((L, D)),
            "qkv_w": _s((L, D, 3 * D)),
            "qkv_b": _s((L, 3 * D)),
            "proj_w": _s((L, D, D)),
            "proj_b": _s((L, D)),
            "ls1": _s((L, D)),
            "norm2_scale": _s((L, D)),
            "norm2_bias": _s((L, D)),
            "fc1_w": _s((L, D, M)),
            "fc1_b": _s((L, M)),
            "fc2_w": _s((L, M, D)),
            "fc2_b": _s((L, D)),
            "ls2": _s((L, D)),
        },
        "norm": {"scale": _s((D,)), "bias": _s((D,))},
    }


def _upsample_spec(dim_in: int, dim_out: int, n_up: int, dim_int: int | None = None):
    dim_int = dim_out if dim_int is None else dim_int
    deconvs = []
    for i in range(n_up):
        cin = dim_int if i == 0 else dim_out
        deconvs.append(_s((cin, 4 * dim_out)))
    return {"proj": _s((dim_in, dim_int)), "deconvs": deconvs}


def encoder_spec(cfg: ModelConfig) -> Dict[str, Any]:
    D = cfg.embed_dim
    ef = cfg.encoder_feature_dims
    dec = cfg.decoder_features
    return {
        "patch_encoder": vit_spec(cfg),
        "image_encoder": vit_spec(cfg),
        "upsample_latent0": _upsample_spec(D, dec, 3, dim_int=ef[0]),
        "upsample_latent1": _upsample_spec(D, ef[0], 2),
        "upsample0": _upsample_spec(D, ef[1], 1),
        "upsample1": _upsample_spec(D, ef[2], 1),
        "upsample2": _upsample_spec(D, ef[3], 1),
        "upsample_lowres": {"w": _s((D, 4 * ef[3])), "b": _s((ef[3],))},
        "fuse_lowres": {"w": _s((2 * ef[3], ef[3])), "b": _s((ef[3],))},
    }


def _rcu_spec(c: int):
    return {
        "conv1_w": _s((3, 3, c, c)),
        "conv1_b": _s((c,)),
        "conv2_w": _s((3, 3, c, c)),
        "conv2_b": _s((c,)),
    }


def decoder_spec(cfg: ModelConfig) -> Dict[str, Any]:
    dec = cfg.decoder_features
    dims = (dec,) + tuple(cfg.encoder_feature_dims)
    # The finest level is produced at decoder width by construction (the
    # latent0 upsample chain projects to ``dec``, encoder_spec above), so
    # it never gets a projection conv -- the reference skips its 1x1 for
    # the same reason (decoder.rs:123-139, "first conv skipped since
    # 256 == 256"). One 3x3 projection per remaining level.
    convs = [{"w": _s((3, 3, d, dec))} for d in dims[1:]]
    fusions = []
    for i in range(len(dims)):
        f = {
            "resnet1": _rcu_spec(dec),
            "resnet2": _rcu_spec(dec),
            "out_conv_w": _s((dec, dec)),
            "out_conv_b": _s((dec,)),
        }
        if i != 0:
            f["deconv_w"] = _s((dec, 4 * dec))
        fusions.append(f)
    return {"convs": convs, "fusions": fusions}


def head_spec(cfg: ModelConfig) -> Dict[str, Any]:
    dec = cfg.decoder_features
    l0, l1 = cfg.head_last_dims
    return {
        "conv0_w": _s((3, 3, dec, dec // 2)),
        "conv0_b": _s((dec // 2,)),
        "deconv1_w": _s((dec // 2, 4 * (dec // 2))),
        "deconv1_b": _s((dec // 2,)),
        "conv2_w": _s((3, 3, dec // 2, l0)),
        "conv2_b": _s((l0,)),
        "conv3_w": _s((l0, l1)),
        "conv3_b": _s((l1,)),
    }


def fov_spec(cfg: ModelConfig) -> Dict[str, Any]:
    D = cfg.embed_dim
    dec = cfg.decoder_features
    k = cfg.tokens_per_side // 4
    return {
        "encoder": vit_spec(cfg),
        "linear": {"w": _s((D, dec // 2)), "b": _s((dec // 2,))},
        "downsample0": {"w": _s((3, 3, dec, dec // 2)), "b": _s((dec // 2,))},
        "head0": {"w": _s((3, 3, dec // 2, dec // 4)), "b": _s((dec // 4,))},
        "head1": {"w": _s((3, 3, dec // 4, dec // 8)), "b": _s((dec // 8,))},
        "head2": {"w": _s((k, k, dec // 8, 1)), "b": _s((1,))},
    }


def param_spec(cfg: ModelConfig, include_fov: bool = True) -> Dict[str, Any]:
    spec = {
        "encoder": encoder_spec(cfg),
        "decoder": decoder_spec(cfg),
        "head": head_spec(cfg),
    }
    if include_fov:
        spec["fov"] = fov_spec(cfg)
    return spec
