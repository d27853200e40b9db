"""Depth Pro model assembly: encoder -> decoder -> head (-> FOV).

Reference: DepthProModelLoader::extract_depth (mod.rs:251-363). Differences
driven by TPU/XLA semantics:

* the whole network runs as one jitted program (the reference loads and
  drops each submodule sequentially to fit 8 GB GPUs, mod.rs:276-334 --
  irrelevant at TPU HBM sizes);
* when the focal length is unknown, the FOV head's scalar stays on device:
  ``f_norm = tan(0.5 * fov_deg * pi/180) / 0.5`` (mod.rs:358) is computed
  inside the program, avoiding the reference's device->host sync at
  mod.rs:356;
* the output is the canonical inverse depth divided by f_norm, clamped to
  [1e-4, 1e4] (mod.rs:361-362).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import ModelConfig
from matrix_eyes_tpu.models import decoder as decoder_mod
from matrix_eyes_tpu.models import encoder as encoder_mod
from matrix_eyes_tpu.models import fov as fov_mod
from matrix_eyes_tpu.models import head as head_mod

Params = Dict[str, Any]


def canonical_inverse_depth(
    cfg: ModelConfig, params: Params, img: jnp.ndarray, use_flash: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """img: (B, S, S, 3) normalised NHWC. Returns (canonical (B, S, S),
    lowres_features) -- the latter feeds the FOV head."""
    encodings = encoder_mod.forward_encodings(cfg, params["encoder"], img, use_flash)
    features, lowres = decoder_mod.forward(params["decoder"], encodings)
    canonical = head_mod.forward(params["head"], features)  # (B, S, S, 1)
    return canonical[..., 0], lowres


@partial(jax.jit, static_argnames=("cfg", "use_flash"))
def forward_with_fnorm(
    cfg: ModelConfig, params: Params, img: jnp.ndarray, f_norm: jnp.ndarray,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Inverse depth when the focal length is known (EXIF / --focal-length).

    img: (B, S, S, 3); f_norm: scalar or (B,). Returns (B, S, S).
    """
    canonical, _ = canonical_inverse_depth(cfg, params, img, use_flash)
    f = jnp.asarray(f_norm, jnp.float32).reshape(-1, 1, 1)
    inv = canonical.astype(jnp.float32) / f
    return jnp.clip(inv, 1e-4, 1e4)


@partial(jax.jit, static_argnames=("cfg", "use_flash"))
def forward_with_fov(
    cfg: ModelConfig, params: Params, img: jnp.ndarray, use_flash: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse depth with the FOV head estimating the focal length
    (mod.rs:340-359). Returns (inverse_depth (B, S, S), fov_deg (B,))."""
    canonical, lowres = canonical_inverse_depth(cfg, params, img, use_flash)
    fov_deg = fov_mod.forward(cfg, params["fov"], img, lowres, use_flash)
    fov_deg = fov_deg.astype(jnp.float32)
    f_norm = jnp.tan(0.5 * fov_deg * math.pi / 180.0) / 0.5
    inv = canonical.astype(jnp.float32) / f_norm.reshape(-1, 1, 1)
    return jnp.clip(inv, 1e-4, 1e4), fov_deg


@partial(jax.jit, static_argnames=("cfg", "use_flash"))
def forward_with_mixed_fnorm(
    cfg: ModelConfig, params: Params, img: jnp.ndarray, f_norm: jnp.ndarray,
    has_f: jnp.ndarray, use_flash: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched forward where only SOME images have a known focal length
    (the per-image semantics of mod.rs:340-359 applied to a batch): the FOV
    head runs once for the whole batch and fills in ``f_norm`` where
    ``has_f`` is False.

    img: (B, S, S, 3); f_norm: (B,) f32 (entries with has_f False are
    ignored); has_f: (B,) bool. Returns (inverse_depth (B, S, S),
    fov_deg (B,)).
    """
    canonical, lowres = canonical_inverse_depth(cfg, params, img, use_flash)
    fov_deg = fov_mod.forward(cfg, params["fov"], img, lowres, use_flash)
    fov_deg = fov_deg.astype(jnp.float32)
    f_est = jnp.tan(0.5 * fov_deg * math.pi / 180.0) / 0.5
    f = jnp.where(has_f, jnp.asarray(f_norm, jnp.float32), f_est)
    inv = canonical.astype(jnp.float32) / f.reshape(-1, 1, 1)
    return jnp.clip(inv, 1e-4, 1e4), fov_deg


def extract_depth(
    cfg: ModelConfig,
    params: Params,
    img: jnp.ndarray,
    f_norm: Optional[float] = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Convenience single-image entry: img (S, S, 3) or (B, S, S, 3);
    returns inverse depth with the same leading shape, clamped to
    [1e-4, 1e4] (mod.rs:361-362)."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    if f_norm is not None:
        inv = forward_with_fnorm(cfg, params, img, jnp.float32(f_norm), use_flash)
    else:
        inv, _ = forward_with_fov(cfg, params, img, use_flash)
    return inv[0] if squeeze else inv
