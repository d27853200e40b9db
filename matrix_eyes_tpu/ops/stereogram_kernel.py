"""Pallas TPU kernel for the stereogram pixel-linking scan.

The recurrence (output.rs:180-185)::

    out[x] = x >= pw ? out[x + shift(x) - pw] : noise[x]

has parents confined to a bounded window: shift in [0, max_shift], so
``out[x]`` reads ``out[x - pw + shift]`` with offsets in [x - pw,
x - pw + max_shift]. That locality is the whole trick here:

* rows ride the 128 vector lanes (the image is processed transposed,
  (W, rows)), so one sequential sweep over x handles 128 rows at once;
* the "gather" of each row's parent becomes a mask-and-sum over the
  (win, 128) trailing window -- iota == shift select, then a sublane
  reduction -- pure VPU work, no scalar gathers at all (XLA's gather
  lowering is what made the pointer-doubling formulation slow on TPU);
* RGB is packed into one int32 lane (r | g<<8 | b<<16) so the scan moves
  one register per pixel; unpacking is an elementwise epilogue.

The scan state (the full (W, 128) output tile) lives in VMEM: at 4032
columns that is ~2 MB, well under the ~16 MB budget. Bit-identical to the
reference algorithm and to the pointer-doubling path (same link structure).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _linker_kernel(shift_ref, noise_ref, out_ref, *, pw: int, win: int):
    w = out_ref.shape[0]

    # pw and w are static, so the noise head is one bulk VMEM copy (a
    # fori_loop of (1, 128)-row copies serializes pw dependent moves)
    head = min(pw, w)
    if head > 0:
        out_ref[:head, :] = noise_ref[:head, :]

    def link(x, _):
        s = shift_ref[pl.ds(x, 1), :]  # (1, 128)
        window = out_ref[pl.ds(x - pw, win), :]  # (win, 128)
        sel = jax.lax.broadcasted_iota(jnp.int32, (win, LANES), 0) == s
        out_ref[pl.ds(x, 1), :] = jnp.sum(
            jnp.where(sel, window, 0), axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(min(pw, w), w, link, 0)


@functools.partial(jax.jit, static_argnames=("pw", "win", "interpret"))
def linker_scan_tpu(shift: jnp.ndarray, noise: jnp.ndarray, pw: int, win: int,
                    interpret: bool = False) -> jnp.ndarray:
    """shift: (H, W) int32; noise: (H, >=pw, 3) uint8. Returns (H, W, 3) u8.

    Precondition: ``1 <= win <= pw`` -- the scan resolves ``out[x] =
    out[x - pw + shift]`` with ``shift < win``, so a window wider than the
    pattern would read rows at or beyond ``x`` that are not written yet
    (the ``wide`` self-link case, which callers route to the XLA
    pointer-doubling path instead). Enforced here because a violation is
    silent pixel corruption, not an error."""
    if not 1 <= win <= pw:
        raise ValueError(
            f"linker_scan_tpu requires 1 <= win <= pw, got win={win} pw={pw} "
            "(the wide self-link case must use the XLA pointer-doubling path)")
    H, W = shift.shape
    h_pad = (H + LANES - 1) // LANES * LANES

    # pack RGB into int32 and transpose to (cols, rows)
    n32 = noise[:, :max(pw, 1), :].astype(jnp.int32)
    packed = n32[..., 0] | (n32[..., 1] << 8) | (n32[..., 2] << 16)  # (H, pw)
    packed = jnp.pad(packed, ((0, h_pad - H), (0, 0))).T  # (pw, h_pad)
    shift_t = jnp.pad(shift, ((0, h_pad - H), (0, 0))).T  # (W, h_pad)

    grid = (h_pad // LANES,)
    kernel = functools.partial(_linker_kernel, pw=pw, win=win)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(pw, 1), LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, h_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * W * h_pad * win,
            bytes_accessed=4 * W * h_pad * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(shift_t, packed)

    out = out.T[:H]  # (H, W) packed
    rgb = jnp.stack(
        [out & 0xFF, (out >> 8) & 0xFF, (out >> 16) & 0xFF], axis=-1)
    return rgb.astype(jnp.uint8)
