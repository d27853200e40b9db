"""Resampler tests: Lanczos3 (image-crate semantics) and bilinear paths."""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from matrix_eyes_tpu.ops.resize import (
    _lanczos3_matrix,
    downsample_half,
    downsample_quarter,
    resize_lanczos3,
    to_u8,
)


def _lanczos3_kernel_scalar(x):
    if x == 0.0:
        return 1.0
    if abs(x) >= 3.0:
        return 0.0
    t = math.pi * np.float32(x)
    return float((np.float32(math.sin(t)) / np.float32(t))
                 * (np.float32(math.sin(t / 3)) / np.float32(t / 3)))


def _resample_axis_scalar(values, n_out):
    """Direct port of the image crate's 1-D sampling loop
    (image-0.25 imageops/sample.rs horizontal_sample/vertical_sample)."""
    n_in = len(values)
    ratio = n_in / n_out
    sratio = max(ratio, 1.0)
    support = 3.0 * sratio
    out = []
    for o in range(n_out):
        center = (o + 0.5) * ratio
        left = int(np.clip(math.floor(center - support), 0, n_in - 1))
        right = int(np.clip(math.ceil(center + support), left + 1, n_in))
        ws = [_lanczos3_kernel_scalar((i + 0.5 - center) / sratio)
              for i in range(left, right)]
        s = sum(ws)
        acc = sum(w / s * values[i] for i, w in zip(range(left, right), ws))
        out.append(acc)
    return out


def test_lanczos_matrix_matches_scalar_loop():
    for n_in, n_out in [(16, 7), (7, 16), (12, 12), (100, 33)]:
        m = _lanczos3_matrix(n_in, n_out)
        vals = np.sin(np.arange(n_in) * 0.7).astype(np.float32)
        got = m @ vals
        want = _resample_axis_scalar(vals, n_out)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lanczos_identity_when_same_size():
    m = _lanczos3_matrix(24, 24)
    # at equal sizes each output center lands exactly on an input pixel,
    # lanczos taps at integers vanish except the center
    np.testing.assert_allclose(m, np.eye(24), atol=1e-5)


def test_lanczos_preserves_constant():
    # weights are normalised, so flat images stay flat
    img = jnp.full((20, 30, 3), 127.0)
    out = np.asarray(resize_lanczos3(img, 13, 47))
    np.testing.assert_allclose(out, 127.0, atol=1e-3)


def test_to_u8_rounds_half_up():
    x = jnp.asarray([0.4, 0.5, 1.5, 254.5, 255.4, 256.0, -1.0])
    np.testing.assert_array_equal(
        np.asarray(to_u8(x)), np.asarray([0, 1, 2, 255, 255, 255, 0], np.uint8))


def test_downsample_half_matches_torch_bilinear():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(downsample_half(jnp.asarray(x)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=0.5,
                         mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)


def test_downsample_quarter_matches_torch_bilinear():
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, size=(1, 32, 32, 2)).astype(np.float32)
    got = np.asarray(downsample_quarter(jnp.asarray(x)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=0.25,
                         mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)
