"""Viridis depth-map colouring as a vectorised device LUT lookup.

Reference: ``map_depth`` / ``map_color`` (output.rs:632-714): for a value in
[0, 1], pick the LUT box ``clamp(floor(value * 255), 0, 254)``, linearly
interpolate between box and box+1, round to u8; values >= 1 return the last
entry. Here the whole image is mapped in one gather + lerp on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from matrix_eyes_tpu.ops.viridis_data import VIRIDIS_B, VIRIDIS_G, VIRIDIS_R

_LUT = np.stack(
    [np.asarray(VIRIDIS_R), np.asarray(VIRIDIS_G), np.asarray(VIRIDIS_B)], axis=1
).astype(np.float32)  # (256, 3)


def map_depth(value: jnp.ndarray) -> jnp.ndarray:
    """value: (...,) floats in [0, 1] (values >= 1 clamp to the last entry).

    Returns (..., 3) uint8 RGB. Matches map_color's arithmetic: step =
    1/255, box = clamp(floor(value/step), 0, 254), ratio = (value -
    step*box)/step, round(c1*(1-ratio) + c2*ratio).
    """
    lut = jnp.asarray(_LUT)
    v = value.astype(jnp.float32)
    step = 1.0 / 255.0
    box = jnp.clip(jnp.floor(v / step), 0, 254).astype(jnp.int32)
    ratio = (v - step * box.astype(jnp.float32)) / step
    c1 = lut[box]  # (..., 3)
    c2 = lut[box + 1]
    # Rust f32::round rounds half away from zero; values are non-negative,
    # so floor(x + 0.5) matches (jnp.round would round half-to-even).
    mixed = jnp.floor(c2 * ratio[..., None] + c1 * (1.0 - ratio[..., None]) + 0.5)
    # the reference returns the last entry exactly when value >= 1.0
    out = jnp.where((v >= 1.0)[..., None], lut[255], mixed)
    return out.astype(jnp.uint8)
