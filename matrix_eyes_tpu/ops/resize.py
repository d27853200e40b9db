"""Image resampling as dense matrix products (MXU-friendly).

Separable resamplers (bilinear, Lanczos3) are expressed as two dense
matmuls: ``out = R_v @ img @ R_h^T`` with resampling matrices built on the
host at trace time (shapes are static under jit). On TPU this turns resizes
into MXU work instead of gathers.

Three samplers, matching three distinct semantics in the reference:

* ``downsample_half`` / ``downsample_quarter``: the model-internal bilinear
  downsamples (pyramid encoder.rs:125-140, FOV fov.rs:53). With
  align_corners=False (what the PyTorch Depth Pro checkpoint was trained
  with) an exact factor-2 bilinear downsample is a 2x2 average pool and a
  factor-4 downsample averages input pixels 4i+1 and 4i+2 -- implemented as
  exact reshapes, no interpolation error.
* ``resize_lanczos3``: the Rust ``image`` crate's Lanczos3 resampler
  (reconstruction.rs:108-113, output.rs:133-137,209-213): support 3.0 scaled
  by the downsampling ratio, taps at integer pixel centres relative to
  ``(out+0.5)*ratio - 0.5``, weights normalised to sum 1, vertical pass then
  horizontal pass, f32 accumulation, final round+clamp to u8 done by the
  caller.
* ``depthmap_bilinear_matrices``: the DepthMap.interpolate_point sampler
  (output.rs:83-98), whose coordinate convention differs from both of the
  above (``x * width`` with no half-pixel shift, clamped taps).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from matrix_eyes_tpu.ops.nn import ACC_T


def downsample_half(x: jnp.ndarray) -> jnp.ndarray:
    """Exact bilinear (align_corners=False) factor-2 downsample = 2x2 mean.

    x: (B, H, W, C) with even H, W.
    """
    B, H, W, C = x.shape
    xf = x.astype(ACC_T).reshape(B, H // 2, 2, W // 2, 2, C)
    return xf.mean(axis=(2, 4)).astype(x.dtype)


def downsample_quarter(x: jnp.ndarray) -> jnp.ndarray:
    """Exact bilinear (align_corners=False) factor-4 downsample.

    Output pixel i samples input at 4i+1.5 -> mean of pixels 4i+1, 4i+2,
    separably in both axes.
    """
    B, H, W, C = x.shape
    xf = x.astype(ACC_T).reshape(B, H // 4, 4, W // 4, 4, C)
    xf = xf[:, :, 1:3, :, 1:3, :]
    return xf.mean(axis=(2, 4)).astype(x.dtype)


def _lanczos3(x: np.ndarray) -> np.ndarray:
    """sinc(x) * sinc(x/3) on |x| < 3, following the image crate's kernel."""
    x = np.asarray(x, dtype=np.float32)
    out = np.zeros_like(x)
    nz = (np.abs(x) < 3.0) & (x != 0.0)
    t = np.pi * x[nz]
    out[nz] = (np.sin(t) / t) * (np.sin(t / 3.0) / (t / 3.0))
    out[x == 0.0] = 1.0
    return out


@lru_cache(maxsize=64)
def _lanczos3_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Resampling matrix (n_out, n_in) for one axis, image-crate semantics.

    Mirrors image::imageops::sample::{horizontal,vertical}_sample: ratio =
    in/out, sratio = max(ratio, 1), src_support = 3*sratio; taps are the
    integer pixels in [floor(c-s), ceil(c+s)) clamped to the image, with
    centre c = (out+0.5)*ratio; weight_i = lanczos3((i + 0.5 - c)/sratio),
    normalised by the (clamped-window) sum.
    """
    ratio = n_in / n_out
    sratio = max(ratio, 1.0)
    support = 3.0 * sratio
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for o in range(n_out):
        center = (o + 0.5) * ratio
        left = int(np.clip(math.floor(center - support), 0, n_in - 1))
        right = int(np.clip(math.ceil(center + support), left + 1, n_in))
        taps = np.arange(left, right, dtype=np.float64)
        w = _lanczos3(((taps + 0.5 - center) / sratio).astype(np.float32))
        s = w.sum()
        if s != 0.0:
            w = w / s
        m[o, left:right] = w
    return m


def resize_lanczos3(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Lanczos3 resize of (H, W, C) f32 data; returns (out_h, out_w, C) f32.

    Vertical pass then horizontal pass (the image crate's order,
    sample.rs::resize). The caller rounds/clamps to u8 if needed.
    """
    H, W, C = img.shape
    rv = jnp.asarray(_lanczos3_matrix(H, out_h))
    rh = jnp.asarray(_lanczos3_matrix(W, out_w))
    x = img.astype(ACC_T)
    # vertical: contract H -> out_h, then horizontal: W -> out_w
    x = jnp.einsum("oh,hwc->owc", rv, x, preferred_element_type=ACC_T)
    x = jnp.einsum("ow,hwc->hoc", rh, x, preferred_element_type=ACC_T)
    return x


def to_u8(img_f32: jnp.ndarray) -> jnp.ndarray:
    """Round-half-away-from-zero and clamp to [0, 255] (image crate's
    FloatNearest conversion); values are non-negative here so round() works."""
    return jnp.clip(jnp.floor(img_f32 + 0.5), 0.0, 255.0).astype(jnp.uint8)


@lru_cache(maxsize=32)
def _depthmap_bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Per-axis sampling matrix for DepthMap.interpolate_point (output.rs:83-98).

    For output position o in [0, n_out): normalised coord o/n_out, scaled by
    n_in (no half-pixel shift), floor/ceil taps clamped to [0, n_in-1],
    linear weights from the fractional part.
    """
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for o in range(n_out):
        x = max((o / n_out) * n_in, 0.0)
        x0 = min(int(math.floor(x)), n_in - 1)
        x1 = min(x0 + 1, n_in - 1)
        f = x - math.floor(x)
        m[o, x0] += np.float32(1.0 - f)
        m[o, x1] += np.float32(f)
    return m


def depthmap_bilinear_resample(depth: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Sample a (H, W) depth grid at the stereogram's output grid.

    Equivalent to calling interpolate_point(x/out_w, y/out_h) for every
    output pixel (output.rs:174-178).
    """
    H, W = depth.shape
    rv = jnp.asarray(_depthmap_bilinear_matrix(H, out_h))
    rh = jnp.asarray(_depthmap_bilinear_matrix(W, out_w))
    x = depth.astype(ACC_T)
    x = rv @ x  # (out_h, W)
    x = x @ rh.T  # (out_h, out_w)
    return x
