"""Autostereogram synthesis as a fully-vectorised device program.

The reference (output.rs:141-193) builds each row with a left-to-right scan
carrying a loop dependency in x::

    out[x] = x >= pw ? out[x + round(depth*dm) - pw] : noise[x % pw]

That recurrence forms per-row linked chains: every pixel's colour is the
colour of a seed pixel (< pw) reached by following parent links
``p(x) = x + shift(x) - pw``. Instead of a sequential scan (W dependent
steps/row), we resolve all chains with **pointer doubling**: k =
ceil(log2(W)) rounds of ``root = root[root]`` gathers, each a dense
(H, W) take_along_axis -- TPU-friendly, identical results.

Noise policy: the reference draws from a thread RNG (output.rs:163-171), so
its output is not reproducible run-to-run. We use ``jax.random`` under an
explicit seed: deterministic for a given (seed, size), documented behaviour
difference.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.ops.resize import depthmap_bilinear_resample


def stereogram_geometry(output_width: int, amplitude: float):
    """depth_multiplier and pattern_width (output.rs:160-161).

    dm = W * amplitude; pw = round(2*dm + amplitude) with Rust's
    round-half-away-from-zero (values are non-negative here).
    """
    import numpy as np

    dm = np.float32(output_width) * np.float32(amplitude)
    pw = int(math.floor(float(np.float32(dm * np.float32(2.0) + np.float32(amplitude))) + 0.5))
    return float(dm), pw


def _max_shift(dm: float) -> int:
    """Largest possible shift = round(1.0 * dm), Rust rounding."""
    return int(math.floor(float(dm) + 0.5))


def _doubling_iterations(out_w: int, pw: int, dm: float) -> int:
    """Pointer-doubling rounds needed: chains step back by at least
    pw - max_shift columns, so the longest chain is bounded and
    ceil(log2(bound)) squarings reach every fixpoint."""
    min_step = max(1, pw - _max_shift(dm))
    max_chain = max(2, -(-out_w // min_step))
    return max(1, math.ceil(math.log2(max_chain)))


def _norm_depth(depth, out_h: int, out_w: int):
    """Normalised depth at every output pixel (output.rs:174-178)."""
    dmin = jnp.min(depth)
    dmax = jnp.max(depth)
    sampled = depthmap_bilinear_resample(depth, out_h, out_w)
    denom = dmax - dmin
    out = jnp.where(denom > 0, (sampled - dmin) / denom, jnp.zeros_like(sampled))
    # Two-tap f32 bilinear can land ~1e-7 above the row max
    # (fl(w1*d) + fl(w2*d) > d), pushing shift = round(dnorm*dm) one past
    # max_shift; the Pallas linker window then matches nothing and emits a
    # black pixel. The reference's arithmetic never needs dnorm > 1.
    return jnp.clip(out, 0.0, 1.0)


@partial(jax.jit, static_argnames=("out_h", "out_w", "pw", "dm"))
def _synthesize(depth, key, out_h: int, out_w: int, pw: int, dm: float):
    dnorm = _norm_depth(depth, out_h, out_w)

    if pw == 0:
        # degenerate amplitude: every pixel keeps its own noise value
        # (out[x] = out[x] leaves the initial noise copy, output.rs:172-185)
        return jax.random.randint(key, (out_h, out_w, 3), 0, 256, dtype=jnp.uint8)

    # Rust f32::round is half-away-from-zero; for non-negative values that
    # is floor(v + 0.5) (jnp.round would round half-to-even).
    shift = jnp.floor(dnorm * jnp.float32(dm) + 0.5).astype(jnp.int32)

    win = _max_shift(dm) + 1
    # Pathological sub-pixel amplitudes (max_shift == pw, i.e. dm ~ 0.5) let
    # a pixel link to itself; the reference then keeps that pixel's *initial*
    # noise value (output_row starts as a full-width noise copy,
    # output.rs:172). Use full-width noise so self-referencing fixpoints
    # >= pw resolve to their own noise, exactly like the Rust scan.
    wide = win > pw
    noise_w = out_w if wide else pw
    noise = jax.random.randint(key, (out_h, noise_w, 3), 0, 256, dtype=jnp.uint8)

    # Kernel VMEM footprint: double-buffered (W, 128) i32 shift + out tiles
    # and a (pw, 128) noise tile, ~1024*(2W + pw) bytes -- wide outputs
    # (panoramas, large resize scales) must take the pointer-doubling path
    # rather than blow the ~16 MB scoped-VMEM budget at compile time.
    fits_vmem = 1024 * (2 * out_w + pw) <= 14 * 1024 * 1024
    if not wide and fits_vmem and jax.default_backend() == "tpu" and win <= 2048:
        from matrix_eyes_tpu.ops.stereogram_kernel import linker_scan_tpu

        return linker_scan_tpu(shift, noise, pw, win)

    x = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
    parent = jnp.where(x >= pw, x + shift - pw, x)

    # pointer doubling: chains step back >= pw - max_shift columns, so a
    # bounded number of squarings reaches every fixpoint (all < pw, plus
    # the self-referencing pixels in the `wide` case)
    root = parent
    for _ in range(_doubling_iterations(out_w, pw, dm)):
        root = jnp.take_along_axis(root, root, axis=1)

    idx = jnp.broadcast_to(root[..., None], (out_h, out_w, 3))
    return jnp.take_along_axis(noise, idx, axis=1)


def synthesize_stereogram(
    depth: jnp.ndarray,
    out_h: int,
    out_w: int,
    amplitude: float,
    seed: int = 0,
) -> jnp.ndarray:
    """depth: (H, W) clamped inverse-depth grid; returns (out_h, out_w, 3) u8."""
    from matrix_eyes_tpu import aot

    dm, pw = stereogram_geometry(out_w, amplitude)
    key = jax.random.PRNGKey(seed)

    def synth(depth, key):
        return _synthesize.__wrapped__(depth, key, out_h, out_w, pw, dm)

    # Persistent AOT cache: the Pallas linker-scan kernel's compile is a
    # noticeable slice of warm CLI latency; seed stays dynamic via `key`.
    return aot.call_cached("stereogram", synth, (depth, key),
                           salt=f"{out_h}x{out_w}|pw={pw}|dm={dm}")


def band_bounds(h: int, band_rows: int):
    """Row-band boundaries [(lo, hi), ...] covering [0, h)."""
    return [(lo, min(lo + band_rows, h)) for lo in range(0, h, band_rows)]


def _split_geometry(out_w: int, amplitude: float):
    """(dm, pw) when the compact (shift, noise) stereogram form applies,
    else None (degenerate pw == 0, the self-link ``wide`` case, or shifts
    over 255 -- callers fall back to the banded RGB path)."""
    dm, pw = stereogram_geometry(out_w, amplitude)
    if pw == 0 or _max_shift(dm) > 255:
        return None
    if _max_shift(dm) + 1 > pw:  # wide: self-linking pixels keep own noise
        return None
    return dm, pw


class StereogramNoisePrefetch(NamedTuple):
    """Noise bands dispatched ahead of time (see prefetch_stereogram_noise);
    the geometry fields let synthesize_stereogram_split reject a prefetch
    that does not match the stereogram it is asked to build."""
    out_h: int
    out_w: int
    amplitude: float
    seed: int
    band_rows: int
    bands: tuple


def prefetch_stereogram_noise(
    out_h: int,
    out_w: int,
    amplitude: float,
    seed: int = 0,
    band_rows: int = 256,
) -> "StereogramNoisePrefetch | None":
    """Dispatch the stereogram's noise program and start its device->host
    transfers NOW.

    The noise depends only on (seed, output shape) -- not on the image --
    so a caller that knows the output geometry before running the model
    (the CLI does: it has decoded the source) can move the ~3*pw bytes/row
    of noise over the link while the device is busy with the forward pass,
    leaving only the shift plane (~1 byte/pixel) to read back afterwards.
    Returns None when the compact form doesn't apply.
    """
    from matrix_eyes_tpu import aot

    geo = _split_geometry(out_w, amplitude)
    if geo is None:
        return None
    _, pw = geo
    key = jax.random.PRNGKey(seed)
    bounds = band_bounds(out_h, band_rows)

    def synth_noise(key):
        noise = jax.random.randint(key, (out_h, pw, 3), 0, 256, dtype=jnp.uint8)
        return tuple(noise[lo:hi] for lo, hi in bounds)

    bands = aot.call_cached(
        "stereogram_noise", synth_noise, (key,),
        salt=f"{out_h}|pw={pw}|br={band_rows}")
    for b in bands:
        cth = getattr(b, "copy_to_host_async", None)
        if cth is not None:
            cth()
    return StereogramNoisePrefetch(out_h, out_w, amplitude, seed, band_rows,
                                   tuple(bands))


def synthesize_stereogram_split(
    depth: jnp.ndarray,
    out_h: int,
    out_w: int,
    amplitude: float,
    seed: int = 0,
    band_rows: int = 256,
    noise: "StereogramNoisePrefetch | None" = None,
):
    """The stereogram in its compact generative form: per-pixel link shifts
    (u8) and per-row noise seed pixels, as row-band device arrays.

    A stereogram is fully determined by ``noise (H, pw, 3)`` and
    ``shift (H, W)`` -- every other pixel is a copy along the link chain
    (output.rs:173-185). Shipping (shift, noise) to the host instead of the
    resolved RGB image cuts the device->host transfer from 3 to
    ~(1 + 3*pw/W) bytes/pixel (~16.6 MB vs 36 MB at 12 MP), and the native
    PNG encoder's worker pool replays the reference's linker scan per row
    band while later bands are still in flight. The resulting file is
    byte-identical to encoding the device-resolved image.

    ``noise`` is an optional prefetch from prefetch_stereogram_noise; a
    prefetch whose geometry/seed does not match is ignored (regenerated
    here), so passing a stale one is safe. Noise and shift are separate
    programs either way: the noise transfer starts before the shift
    program runs, and with a prefetch it starts before the model forward.

    Returns (pattern_width, [(shift_band (n, W) u8, noise_band (n, pw, 3)
    u8), ...]) or None when the compact form doesn't apply.
    """
    from matrix_eyes_tpu import aot

    geo = _split_geometry(out_w, amplitude)
    if geo is None:
        return None
    dm, pw = geo
    bounds = band_bounds(out_h, band_rows)

    if noise is not None and (noise.out_h, noise.out_w, noise.amplitude,
                              noise.seed, noise.band_rows) != (
                                  out_h, out_w, amplitude, seed, band_rows):
        noise = None
    if noise is None:
        noise = prefetch_stereogram_noise(out_h, out_w, amplitude, seed,
                                          band_rows)

    def synth_shift(depth):
        dnorm = _norm_depth(depth, out_h, out_w)
        shift = jnp.floor(dnorm * jnp.float32(dm) + 0.5).astype(jnp.uint8)
        return tuple(shift[lo:hi] for lo, hi in bounds)

    shift_bands = aot.call_cached(
        "stereogram_shift", synth_shift, (depth,),
        salt=f"{out_h}x{out_w}|pw={pw}|dm={dm}|br={band_rows}")
    return pw, tuple(zip(shift_bands, noise.bands))


def synthesize_stereogram_bands(
    depth: jnp.ndarray,
    out_h: int,
    out_w: int,
    amplitude: float,
    seed: int = 0,
    band_rows: int = 256,
):
    """Like synthesize_stereogram but returns the image as a tuple of
    row-band device arrays ((n_i, out_w, 3) u8, top to bottom) from a
    single dispatch, so the host can overlap readback with PNG encoding
    (output/png.save_device_bands)."""
    from matrix_eyes_tpu import aot

    dm, pw = stereogram_geometry(out_w, amplitude)
    key = jax.random.PRNGKey(seed)
    bounds = band_bounds(out_h, band_rows)

    def synth(depth, key):
        img = _synthesize.__wrapped__(depth, key, out_h, out_w, pw, dm)
        return tuple(img[lo:hi] for lo, hi in bounds)

    return aot.call_cached(
        "stereogram_bands", synth, (depth, key),
        salt=f"{out_h}x{out_w}|pw={pw}|dm={dm}|br={band_rows}")


def reference_rows(depth_norm, noise, pw: int, dm: float):
    """Sequential per-row reference of the reference's scan (for tests).

    depth_norm: (H, W) normalised depth at output pixels; noise: (H, n, 3)
    u8 with n >= pw (pass n == W to model the reference's full-width
    noise rows and initial output_row = noise copy, output.rs:165-172).
    Pure numpy, mirrors output.rs:172-185.
    """
    import numpy as np

    H, W = depth_norm.shape
    out = np.zeros((H, W, 3), np.uint8)
    n = noise.shape[1]
    out[:, : min(n, W)] = noise[:, :W]
    for y in range(H):
        for x in range(W):
            if x >= pw:
                shift = int(np.floor(depth_norm[y, x] * np.float32(dm) + 0.5))
                out[y, x] = out[y, x + shift - pw]
            else:
                out[y, x] = noise[y, x % pw]
    return out
