"""Pallas linker-scan kernel vs the sequential reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from matrix_eyes_tpu.ops.stereogram import (
    _max_shift,
    reference_rows,
    stereogram_geometry,
)
from matrix_eyes_tpu.ops.stereogram_kernel import linker_scan_tpu


@pytest.mark.parametrize("H,W,amplitude", [
    (12, 256, 0.02),   # tiny pattern width
    (6, 33, 0.45),     # extreme amplitude, wide window
    (5, 64, 0.11),
    (130, 101, 0.0625),   # rows > one lane tile
    (8, 40, 0.3),
])
def test_linker_scan_matches_reference(H, W, amplitude):
    rng = np.random.RandomState(0)
    dm, pw = stereogram_geometry(W, amplitude)
    if pw == 0:
        pytest.skip("degenerate geometry")
    dnorm = rng.uniform(0, 1, size=(H, W)).astype(np.float32)
    shift = np.floor(dnorm * np.float32(dm) + 0.5).astype(np.int32)
    noise = rng.randint(0, 256, size=(H, max(pw, 1), 3), dtype=np.uint8)

    win = _max_shift(dm) + 1
    got = np.asarray(linker_scan_tpu(
        jnp.asarray(shift), jnp.asarray(noise), pw, win, interpret=True))
    want = reference_rows(dnorm, noise, pw, dm)
    np.testing.assert_array_equal(got, want)
