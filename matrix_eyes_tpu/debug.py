"""Per-stage activation dumps for parity debugging.

SURVEY.md ranks "layer-parity debugging across 24-block ViTs x3 instances"
among the hard parts and calls for per-layer dump tooling. ``dump_stages``
runs the model and returns every stage boundary's activations by name;
``save_dump`` writes them to an npz for offline diffing against a PyTorch
dump of the same image (tests/torch_ref.py mirrors the stage names).

Usage:
    from matrix_eyes_tpu.debug import dump_stages, save_dump
    acts = dump_stages(cfg, params, img)          # dict[str, np.ndarray]
    save_dump(acts, "jax_dump.npz")
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp

from matrix_eyes_tpu.config import ModelConfig
from matrix_eyes_tpu.models import decoder as decoder_mod
from matrix_eyes_tpu.models import encoder as encoder_mod
from matrix_eyes_tpu.models import fov as fov_mod
from matrix_eyes_tpu.models import head as head_mod
from matrix_eyes_tpu.models import vit

ENCODING_NAMES = ("latent0", "latent1", "x0", "x1", "global")


def dump_stages(
    cfg: ModelConfig,
    params: Dict[str, Any],
    img: jnp.ndarray,
    use_flash: bool = False,
    include_fov: bool = True,
) -> Dict[str, np.ndarray]:
    """img: (B, S, S, 3) normalised NHWC. Returns named activations
    (NHWC / token-major), fetched to host."""
    out: Dict[str, np.ndarray] = {}

    # patch-encoder tokens on the pyramid batch
    x2 = None
    from matrix_eyes_tpu.ops.resize import downsample_half, downsample_quarter

    p = cfg.vit_img_size
    x0p = encoder_mod.split(img, p, 4)
    x1p = encoder_mod.split(downsample_half(img), p, 2)
    x2 = downsample_quarter(img)
    pyramid = jnp.concatenate([x0p, x1p, x2], axis=0)
    tokens, inters = vit.forward_features(
        cfg, params["encoder"]["patch_encoder"], pyramid,
        intermediate_blocks=cfg.highres_block_ids, use_flash=use_flash)
    out["patch_tokens"] = np.asarray(tokens, np.float32)
    for i, t in enumerate(inters):
        out[f"patch_highres{i}"] = np.asarray(t, np.float32)

    encodings = encoder_mod.forward_encodings(cfg, params["encoder"], img, use_flash)
    for name, e in zip(ENCODING_NAMES, encodings):
        out[f"enc_{name}"] = np.asarray(e, np.float32)

    features, lowres = decoder_mod.forward(params["decoder"], encodings)
    out["dec_features"] = np.asarray(features, np.float32)
    out["dec_lowres"] = np.asarray(lowres, np.float32)

    canonical = head_mod.forward(params["head"], features)
    out["canonical_inverse_depth"] = np.asarray(canonical[..., 0], np.float32)

    if include_fov and "fov" in params:
        fov_deg = fov_mod.forward(cfg, params["fov"], img, lowres, use_flash)
        out["fov_deg"] = np.asarray(fov_deg, np.float32)
    return out


def save_dump(acts: Dict[str, np.ndarray], path: str) -> None:
    np.savez_compressed(path, **acts)


def compare_dumps(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray],
                  rtol: float = 1e-3) -> Dict[str, float]:
    """Max relative difference per stage (for a quick parity report)."""
    report = {}
    for k in sorted(set(a) & set(b)):
        x, y = np.asarray(a[k], np.float32), np.asarray(b[k], np.float32)
        if x.shape != y.shape:
            report[k] = float("inf")
            continue
        denom = np.maximum(np.abs(y), 1e-3)
        report[k] = float(np.max(np.abs(x - y) / denom))
    return report
