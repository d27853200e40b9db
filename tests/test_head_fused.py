"""Fused depth head (deconv1+conv2 composed into one 3x3 conv) vs the
stage-by-stage reference formulation (mod.rs:307-334).

The composition must be exact up to float rounding everywhere, including
conv2's zero-padding boundary behaviour (the deconv bias is routed through
a zero-padded ones-channel precisely so the edge rows/cols match)."""

import numpy as np
import pytest

import jax.numpy as jnp

from matrix_eyes_tpu.models import head


def _rand_params(rng, ci, cd, o):
    r = lambda *s: jnp.asarray(rng.uniform(-0.5, 0.5, s).astype(np.float32))
    return {
        "conv0_w": r(3, 3, ci * 2, ci),
        "conv0_b": r(ci),
        "deconv1_w": r(ci, 4 * cd),
        "deconv1_b": r(cd),
        "conv2_w": r(3, 3, cd, o),
        "conv2_b": r(o),
        "conv3_w": r(o, 1),
        "conv3_b": r(1),
    }


@pytest.mark.parametrize("hw", [4, 6, 12])  # small grids: boundary-dominated
def test_fused_matches_unfused_f32(hw):
    rng = np.random.RandomState(hw)
    p = _rand_params(rng, ci=8, cd=8, o=4)
    x = jnp.asarray(rng.uniform(-1, 1, (2, hw, hw, 16)).astype(np.float32))
    want = head.forward_unfused(p, x)
    got = head.forward(p, x)
    assert got.shape == want.shape == (2, 2 * hw, 2 * hw, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_unfused_bf16():
    rng = np.random.RandomState(0)
    p = {k: v.astype(jnp.bfloat16) for k, v in _rand_params(rng, 8, 8, 4).items()}
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 16)).astype(np.float32), jnp.bfloat16)
    want = np.asarray(head.forward_unfused(p, x), np.float32)
    got = np.asarray(head.forward(p, x), np.float32)
    # bf16: both formulations round differently; agree to half-precision noise
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
