"""Headline benchmark: one 1536^2 photo -> depth + stereogram on one chip.

Measures the device pipeline steady-state wall-clock per image: Lanczos3
preprocess + normalise, full Depth Pro forward (encoder, decoder, head)
with FOV focal estimation, DepthMap clamp, and stereogram synthesis at the
source resolution. The decoded photo lives in HBM; file decode/encode and
host transfer are excluded (host-side serialisation is not the metric and
the dev tunnel would dominate it).

Methodology notes:
* every iteration perturbs the photo on device and uses a fresh stereogram
  seed, so no result (or relay-level) caching can short-circuit the run;
  only a 4-byte scalar is uploaded per iteration and a checksum scalar read
  back;
* baseline: the reference publishes no timings (BASELINE.md); the
  north-star target is < 1 s per image on one v5e chip, so
  vs_baseline = 1.0 / measured_s (>1 = faster than target).

Prints ONE JSON line (driver contract). The headline metric is the device
pipeline; the user-visible end-to-end numbers (device pipeline + readback
to host + PNG encode, i.e. everything after file decode) ride in the same
line: "e2e_png_*" for the stereogram format, "e2e_depthmap_png_s" (+ floor
/software attribution) for the depth-map format (output.rs:123-139), and
"batch4_imgs_per_s" for the batched forward throughput (BASELINE config 5,
the CLI's --batch-size=4 executable shape):
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, "e2e_png_s": N,
   "e2e_depthmap_png_s": N, "batch4_imgs_per_s": N}
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    from matrix_eyes_tpu.config import (
        DEPTH_PRO,
        TINY,
        RuntimeConfig,
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models.init import init_params_fast
    from matrix_eyes_tpu.ops.stereogram import stereogram_geometry, _synthesize
    from matrix_eyes_tpu.output.depthmap import _clamp_inverse_depth
    from matrix_eyes_tpu.pipeline import preprocess_image

    # BENCH_CONFIG=tiny + BENCH_PHOTO=HxW: the test-scale smoke mode --
    # the suite runs the whole script (same code path, same JSON contract)
    # on CPU in seconds, so a refactor can't silently break the artifact
    # the driver records (tests/test_bench_smoke.py)
    cfg = TINY if os.environ.get("BENCH_CONFIG") == "tiny" else DEPTH_PRO
    # BENCH_DTYPE=f32 times the reference-grade path (true-f32 matmul
    # precision on TPU); BENCH_DTYPE=int8 the quantized serving layout;
    # default is the shipping config (bf16 on TPU)
    from matrix_eyes_tpu.config import configure_matmul_precision, parse_dtype_policy

    bench_dtype = os.environ.get("BENCH_DTYPE")
    bd, bquant, bmixed = (parse_dtype_policy(bench_dtype) if bench_dtype
                          else (None, False, False))
    runtime = RuntimeConfig(dtype=bd, quantize_int8=bquant, mixed_bf16=bmixed)
    # the dtype the image is preprocessed to (f32 for the mixed policy --
    # dtype flow is input-driven, see ops/mixed.py)
    dtype = runtime.image_dtype()
    configure_matmul_precision(runtime.resolved_dtype(), runtime.mixed_bf16)
    use_flash = runtime.use_flash_attention()

    if bmixed:
        from matrix_eyes_tpu.ops.mixed import cast_params_mixed

        params = jax.block_until_ready(
            cast_params_mixed(init_params_fast(cfg, dtype=jnp.float32)))
    else:
        params = jax.block_until_ready(
            init_params_fast(cfg, dtype=runtime.resolved_dtype()))
    if bquant:
        from matrix_eyes_tpu.ops.quant import quantize_params_device

        params = jax.block_until_ready(quantize_params_device(params))

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    src_h, src_w = (int(x) for x in
                    os.environ.get("BENCH_PHOTO", "3024x4032").split("x"))
    photo = jnp.asarray(rng.randint(0, 256, size=(src_h, src_w, 3), dtype=np.uint8))
    photo.block_until_ready()
    amplitude = 1.0 / 16.0
    dm, pw = stereogram_geometry(src_w, amplitude)

    @partial(jax.jit, static_argnames=())
    def device_pipeline(photo_u8, perturb, key):
        # perturb on device so every iteration is genuinely unique work
        p = (photo_u8.astype(jnp.int32) + perturb) % 256
        img = preprocess_image.__wrapped__(p.astype(jnp.uint8), cfg.img_size, dtype)
        inv, _fov = depth_pro.forward_with_fov.__wrapped__(cfg, params, img, use_flash)
        data = _clamp_inverse_depth.__wrapped__(inv[0])
        stereo = _synthesize.__wrapped__(data, key, src_h, src_w, pw, dm)
        return jnp.sum(stereo.astype(jnp.uint32))

    checksum = device_pipeline(photo, jnp.int32(0), jax.random.PRNGKey(0))
    _ = np.asarray(checksum)  # compile + warmup, hard sync

    # Async completion signals can be optimistic through remote runtimes, so
    # measure total wall time for N pipelined iterations (each with unique
    # inputs) and force everything with one final host readback.
    # 24 iterations: at 8, per-dispatch overhead through the dev tunnel was
    # still visible (~0.168 vs ~0.164 s/image); deeper pipelining hides it
    # and 24 x ~0.17 s of device time is still trivial.
    iters = int(os.environ.get("BENCH_ITERS", "24"))
    perturbs = [jnp.int32(rng.randint(1, 255)) for _ in range(iters)]
    keys = [jax.random.PRNGKey(rng.randint(0, 2**31 - 1)) for _ in range(iters)]
    for p, k in zip(perturbs, keys):
        p.block_until_ready(), k.block_until_ready()
    t0 = time.perf_counter()
    sums = [device_pipeline(photo, p, k) for p, k in zip(perturbs, keys)]
    _ = [np.asarray(s) for s in sums]
    elapsed = (time.perf_counter() - t0) / iters

    # Whole-model FLOP/MFU accounting (flops.py): the LOGICAL model math
    # (mod.rs:251-363) per image over the measured wall-clock, against the
    # chip's published dense bf16 peak. Preprocess/stereogram ride in the
    # denominator but not the numerator, so the reported MFU is a slight
    # *under*statement of the forward's own utilisation.
    from matrix_eyes_tpu import flops as me_flops

    ledger = me_flops.model_flops(cfg, with_fov=True)
    peak = me_flops.device_peak_flops()
    mfu_headline = me_flops.mfu(ledger["total"], elapsed, peak)

    # User-visible end-to-end: same device pipeline, but returning the
    # full stereogram, reading it back to host (~36 MB over the link) and
    # encoding the PNG file a user would actually open (output.rs:141-193
    # ends at out_image.save). File *decode* is still excluded (input lives
    # in HBM), matching the headline metric's starting point.
    #
    # This is the CLI's own save path: whole-plane device->host transfers
    # (fewest link round trips; see the one-shot forensic in
    # docs/PERFORMANCE.md), re-sliced on the host into ENCODE_ROWS stripes
    # for the native striped encoder's worker pool. The file lands on
    # tmpfs: this sandbox's disk writes at ~6 MB/s (an infra artifact -- a
    # production host's page cache absorbs the ~7 MB file instantly), and
    # tmpfs is the closest model of that.
    import tempfile

    from matrix_eyes_tpu.native import pngwriter
    from matrix_eyes_tpu.ops.stereogram import _norm_depth, band_bounds
    from matrix_eyes_tpu.output import png as me_png

    out_dir = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    out_path = os.path.join(out_dir, "me_bench_stereo.png")
    # whole-plane transfer, matching the product save path: per-output
    # first-fetch round trips through a remote link dominate one-shot runs
    # (docs/PERFORMANCE.md one-shot forensic); the encoder re-slices the
    # host copy at png.ENCODE_ROWS so the worker pool still parallelises
    bounds = band_bounds(src_h, src_h)
    assert me_png.split_supported(), "native PNG encoder must build for the bench"

    # The CLI's stereogram .png path: the image leaves the device in its
    # compact generative form -- per-pixel u8 link shifts + per-row noise
    # seeds, ~16.6 MB instead of the 36 MB resolved RGB -- and the native
    # encoder's worker pool replays the reference's linker scan
    # (output.rs:173-185) per host stripe. Output file is byte-identical
    # to encoding the device-resolved stereogram (tests/test_pngwriter.py
    # proves it).
    # Like the CLI, the noise plane (seed- and geometry-only) is
    # prefetched BEFORE the forward dispatch, so its ~4.6 MB transfers
    # while the device computes and only the shift plane (~12 MB) reads
    # back afterwards (ops.stereogram.prefetch_stereogram_noise).
    from matrix_eyes_tpu.ops.stereogram import (
        _split_geometry,
        prefetch_stereogram_noise,
    )

    # The compact form only applies at sane geometries (pw > 0, shifts fit
    # u8, no self-link case); a BENCH_PHOTO override outside that envelope
    # falls back to the CLI's other save path: resolved RGB row bands with
    # the same transfer/encode overlap (3 bytes/pixel instead of ~1.4).
    compact = _split_geometry(src_w, amplitude) is not None

    @jax.jit
    def device_pipeline_shift(photo_u8, perturb):
        p = (photo_u8.astype(jnp.int32) + perturb) % 256
        img = preprocess_image.__wrapped__(p.astype(jnp.uint8), cfg.img_size, dtype)
        inv, _fov = depth_pro.forward_with_fov.__wrapped__(cfg, params, img, use_flash)
        data = _clamp_inverse_depth.__wrapped__(inv[0])
        dnorm = _norm_depth(data, src_h, src_w)
        shift = jnp.floor(dnorm * jnp.float32(dm) + 0.5).astype(jnp.uint8)
        return tuple(shift[lo:hi] for lo, hi in bounds)

    @jax.jit
    def device_pipeline_rgb(photo_u8, perturb, key):
        p = (photo_u8.astype(jnp.int32) + perturb) % 256
        img = preprocess_image.__wrapped__(p.astype(jnp.uint8), cfg.img_size, dtype)
        inv, _fov = depth_pro.forward_with_fov.__wrapped__(cfg, params, img, use_flash)
        data = _clamp_inverse_depth.__wrapped__(inv[0])
        stereo = _synthesize.__wrapped__(data, key, src_h, src_w, pw, dm)
        return tuple(stereo[lo:hi] for lo, hi in bounds)

    if compact:
        def one_e2e(perturb, seed):
            noise = prefetch_stereogram_noise(src_h, src_w, amplitude, seed,
                                              band_rows=src_h)
            shifts = device_pipeline_shift(photo, perturb)
            me_png.save_stereogram_split(tuple(zip(shifts, noise.bands)),
                                         out_path, pw)
    else:
        def one_e2e(perturb, seed):
            bands = device_pipeline_rgb(photo, perturb, jax.random.PRNGKey(seed))
            me_png.save_device_bands(bands, out_path)

    def measure_control() -> float:
        # Relay-health control: the dev tunnel's per-dispatch round-trip
        # latency oscillates ~60x between windows (docs/PERFORMANCE.md).
        # Median of three trivial dispatch+readback round trips; ~0.04 s
        # healthy on this link, >> that marks a degraded window.
        tiny = jnp.zeros((8,), jnp.float32) + jnp.float32(rng.randint(1, 255))
        rts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(jnp.sum(tiny + jnp.float32(i)))
            rts.append(time.perf_counter() - t0)
        return sorted(rts)[1]

    # noise seeds from the run's own RNG: unique per iteration AND per
    # bench run, so a result-caching relay can't serve the noise bands
    # from a previous run (the methodology in the module docstring).
    # Seed layout: attempt k owns [sb, sb + span) with sb = seed_base +
    # k*span; within an attempt the e2e loop uses sb+1..sb+e2e_iters and
    # the floor loop continues AFTER it (no reuse anywhere), and seed_base
    # leaves headroom for every attempt.
    # clamped to >= 1: zero attempts would leave the loop unrun and crash
    # min() below with an empty list instead of surfacing the config error
    attempts = max(1, int(os.environ.get("BENCH_E2E_ATTEMPTS", "3")))
    e2e_iters = max(2, iters // 2)
    span = 16 * (iters + 256)
    seed_base = int(rng.randint(0, 2**31 - 1 - attempts * span))
    one_e2e(jnp.int32(0), seed_base)  # warmup (compiles both programs)

    # The e2e/floor terms are transfer-bound, so a degraded tunnel window
    # at measurement time would record the relay, not the software. Take
    # up to 3 attempts (unique seeds throughout), keep the best, and
    # report every attempt with its own control so the artifact stays
    # honest about the window it was measured in.
    e2e_attempts = []
    host = None
    for attempt in range(attempts):
        sb = seed_base + attempt * span
        t0 = time.perf_counter()
        for i, p in enumerate(perturbs[:e2e_iters]):
            one_e2e(p, sb + 1 + i)
        e2e_elapsed = (time.perf_counter() - t0) / e2e_iters

        # Attribution: (a) the raw readback floor -- same arrays, no
        # encode -- is the dev tunnel's bandwidth cost (infra; ~GB/s PCIe
        # on a production host); (b) below, the pure software cost.
        # e2e ~= max(floor, software) when the overlap works; on
        # production hosts only (b) remains.
        t0 = time.perf_counter()
        for i, p in enumerate(perturbs[:2]):
            seed = sb + 1 + e2e_iters + i  # continues past the e2e seeds
            if compact:
                noise = prefetch_stereogram_noise(src_h, src_w, amplitude,
                                                  seed, band_rows=src_h)
                shifts = device_pipeline_shift(photo, p)
                for s in shifts:
                    s.copy_to_host_async()
                host = [(np.asarray(s), np.asarray(n))
                        for s, n in zip(shifts, noise.bands)]
            else:
                bands = device_pipeline_rgb(photo, p, jax.random.PRNGKey(seed))
                for b in bands:
                    b.copy_to_host_async()
                host = [np.asarray(b) for b in bands]
        readback_floor = (time.perf_counter() - t0) / 2

        e2e_attempts.append({"e2e_png_s": round(e2e_elapsed, 4),
                             "readback_floor_s": round(readback_floor, 4),
                             "relay_dispatch_rt_s": round(measure_control(), 4)})
        if e2e_elapsed < 1.0:
            break  # already under the north star; no reason to re-measure
        if attempt < attempts - 1:
            time.sleep(60)  # degraded window: give the tunnel a minute

    best = min(e2e_attempts, key=lambda a: a["e2e_png_s"])
    e2e_elapsed = best["e2e_png_s"]
    readback_floor = best["readback_floor_s"]
    dispatch_rt = best["relay_dispatch_rt_s"]

    # --- depth-map e2e: the reference's OTHER image format --------------
    # (output.rs:123-139: normalise, viridis, resize to source, save).
    # Same methodology as the stereogram e2e, through the PRODUCT save
    # path: the grid-resolution colour image crosses the link (3 B/px at
    # 1536^2, ~5x less than the source-size plane) and the native host
    # Lanczos3 resizer upsizes before the striped encode
    # (output/png.save_depthmap_host_resize; profile Up + level 1 --
    # policy measurements in output/png.py). Falls back to the device-
    # resize band path where the native resizer is unavailable.
    from matrix_eyes_tpu.output.depthmap import _render_depth_map, _render_depth_map_grid

    dm_out_path = os.path.join(out_dir, "me_bench_depth.png")
    dm_host_path = me_png.host_resize_supported() and src_h * src_w > cfg.img_size ** 2

    def make_dm_fns(params_, img_dtype):
        """(one_dm_e2e, dm_readback) for a parameter set / image dtype --
        shared by the default-dtype and the mixed-mode measurements."""
        if dm_host_path:
            @jax.jit
            def device_pipeline_dm(photo_u8, perturb):
                p = (photo_u8.astype(jnp.int32) + perturb) % 256
                img = preprocess_image.__wrapped__(
                    p.astype(jnp.uint8), cfg.img_size, img_dtype)
                inv, _fov = depth_pro.forward_with_fov.__wrapped__(
                    cfg, params_, img, use_flash)
                data = _clamp_inverse_depth.__wrapped__(inv[0])
                return _render_depth_map_grid.__wrapped__(data)

            def one_dm_e2e(perturb):
                me_png.save_depthmap_host_resize(
                    device_pipeline_dm(photo, perturb),
                    dm_out_path, src_h, src_w)

            def dm_readback(perturb):
                grid = device_pipeline_dm(photo, perturb)
                grid.copy_to_host_async()
                return [np.asarray(grid)]
        else:
            @jax.jit
            def device_pipeline_dm(photo_u8, perturb):
                p = (photo_u8.astype(jnp.int32) + perturb) % 256
                img = preprocess_image.__wrapped__(
                    p.astype(jnp.uint8), cfg.img_size, img_dtype)
                inv, _fov = depth_pro.forward_with_fov.__wrapped__(
                    cfg, params_, img, use_flash)
                data = _clamp_inverse_depth.__wrapped__(inv[0])
                rgb = _render_depth_map.__wrapped__(data, src_h, src_w)
                return tuple(rgb[lo:hi] for lo, hi in bounds)

            def one_dm_e2e(perturb):
                me_png.save_device_bands(device_pipeline_dm(photo, perturb),
                                         dm_out_path, **me_png.DEPTH_MAP)

            def dm_readback(perturb):
                bands_d = device_pipeline_dm(photo, perturb)
                for b in bands_d:
                    b.copy_to_host_async()
                return [np.asarray(b) for b in bands_d]
        return one_dm_e2e, dm_readback

    one_dm_e2e, dm_readback = make_dm_fns(params, dtype)

    one_dm_e2e(jnp.int32(0))  # warmup/compile
    dm_attempts = []
    dm_host = None
    for attempt in range(attempts):
        t0 = time.perf_counter()
        for p in perturbs[:e2e_iters]:
            one_dm_e2e(p)
        dm_elapsed = (time.perf_counter() - t0) / e2e_iters
        t0 = time.perf_counter()
        for p in perturbs[:2]:
            dm_host = dm_readback(p)
        dm_floor = (time.perf_counter() - t0) / 2
        dm_attempts.append({"e2e_png_s": round(dm_elapsed, 4),
                            "readback_floor_s": round(dm_floor, 4),
                            "relay_dispatch_rt_s": round(measure_control(), 4)})
        if dm_elapsed < 1.0:
            break
        if attempt < attempts - 1:
            time.sleep(60)
    dm_best = min(dm_attempts, key=lambda a: a["e2e_png_s"])

    # pure software cost of the depth-map save (window-independent):
    # host resize (when active) + striped encode from host-resident planes
    t0 = time.perf_counter()
    for _ in range(reps_dm := 3):
        if dm_host_path:
            from matrix_eyes_tpu.native import lanczos as me_lanczos

            full = me_lanczos.resize_rgb8(dm_host[0], src_h, src_w)
            planes = [full]
        else:
            planes = dm_host
        with pngwriter.PngEncoder(dm_out_path, src_w, src_h,
                                  level=me_png.DEPTH_MAP["level"],
                                  filter=me_png.DEPTH_MAP["filter"]) as enc:
            for b in planes:
                for stripe in me_png._host_stripes(b):
                    enc.write_rows(stripe)
    dm_software = (time.perf_counter() - t0) / reps_dm

    # --- batched throughput (BASELINE config 5), device-side ------------
    # One program: 4 perturbed copies of the photo -> preprocess ->
    # batch-4 forward over the pyramid patch axis (the CLI's
    # --batch-size=4 forward; cli.py routes directories through
    # pipeline.extract_depth_batch which replays this executable shape).
    BATCH = 4

    @jax.jit
    def device_pipeline_batch(photo_u8, perturbs_b):
        p = (photo_u8[None].astype(jnp.int32)
             + perturbs_b[:, None, None, None]) % 256
        imgs = jnp.concatenate([
            preprocess_image.__wrapped__(p[i].astype(jnp.uint8),
                                         cfg.img_size, dtype)
            for i in range(BATCH)])
        inv, _fov = depth_pro.forward_with_fov.__wrapped__(
            cfg, params, imgs, use_flash)
        return jnp.sum(inv.astype(jnp.float32))

    pb0 = jnp.asarray(rng.randint(1, 255, size=(BATCH,)), jnp.int32)
    _ = np.asarray(device_pipeline_batch(photo, pb0))  # warmup/compile
    iters_b = max(2, iters // BATCH)
    pbs = [jnp.asarray(rng.randint(1, 255, size=(BATCH,)), jnp.int32)
           for _ in range(iters_b)]
    for pb in pbs:
        pb.block_until_ready()
    t0 = time.perf_counter()
    sums_b = [device_pipeline_batch(photo, pb) for pb in pbs]
    _ = [np.asarray(s) for s in sums_b]
    batch_per_image = (time.perf_counter() - t0) / (iters_b * BATCH)

    # --- mixed weight-precision mode (--dtype mixed) --------------------
    # The repo's best accuracy-per-byte result (canonical p99 0.23 % for
    # +88 MiB over bf16; docs/parity/, scripts/bf16_attribution.py):
    # measure its device wall-clock + depth-map e2e in the same artifact
    # so the default-dtype choice cites a measurement (round-5 verdict).
    # Runs LAST: its f32 stages need matmul precision HIGHEST, and the
    # process-global flip must not touch the earlier compiles. Skipped
    # when BENCH_DTYPE pins a non-default mode ('value' measures that).
    mixed_device = mixed_dm = mixed_mfu = None
    if not bench_dtype:
        from matrix_eyes_tpu.ops.mixed import cast_params_mixed

        configure_matmul_precision(jnp.float32, True)
        params_mixed = jax.block_until_ready(cast_params_mixed(
            init_params_fast(cfg, dtype=jnp.float32)))

        @jax.jit
        def device_pipeline_mixed(photo_u8, perturb, key):
            p = (photo_u8.astype(jnp.int32) + perturb) % 256
            img = preprocess_image.__wrapped__(
                p.astype(jnp.uint8), cfg.img_size, jnp.float32)
            inv, _fov = depth_pro.forward_with_fov.__wrapped__(
                cfg, params_mixed, img, use_flash)
            data = _clamp_inverse_depth.__wrapped__(inv[0])
            stereo = _synthesize.__wrapped__(data, key, src_h, src_w, pw, dm)
            return jnp.sum(stereo.astype(jnp.uint32))

        _ = np.asarray(device_pipeline_mixed(
            photo, jnp.int32(0), jax.random.PRNGKey(1)))  # warmup/compile
        t0 = time.perf_counter()
        sums_m = [device_pipeline_mixed(photo, p, k)
                  for p, k in zip(perturbs, keys)]
        _ = [np.asarray(s) for s in sums_m]
        mixed_device = (time.perf_counter() - t0) / iters
        mixed_mfu = me_flops.mfu(ledger["total"], mixed_device, peak)

        one_dm_e2e_m, _ = make_dm_fns(params_mixed, jnp.float32)
        one_dm_e2e_m(jnp.int32(0))  # warmup/compile
        t0 = time.perf_counter()
        for p in perturbs[:e2e_iters]:
            one_dm_e2e_m(p)
        mixed_dm = (time.perf_counter() - t0) / e2e_iters
        del params_mixed

    # (b) the pure software cost -- linker-scan replay + striped encode
    # from host-resident arrays to the same file; window-independent.
    # Re-slice the whole-plane host arrays at ENCODE_ROWS exactly like the
    # product save path does (output/png.py) -- one stripe per pool task,
    # byte-identical file, same multi-core behaviour.
    t0 = time.perf_counter()
    reps = 3
    stripes = me_png._host_stripes
    for _ in range(reps):
        with pngwriter.PngEncoder(out_path, src_w, src_h, level=1,
                                  filter=pngwriter.FILTER_NONE) as enc:
            if compact:
                for s, n in host:
                    for ss, ns in zip(stripes(s), stripes(n)):
                        enc.write_stereo_rows(ss, ns, pw)
            else:
                for b in host:
                    for stripe in stripes(b):
                        enc.write_rows(stripe)
    png_software = (time.perf_counter() - t0) / reps

    print(json.dumps({
        "metric": "photo1536_to_depth_stereogram_wall_clock",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(1.0 / elapsed, 2),
        # user-visible end-to-end (device pipeline + banded readback +
        # striped PNG encode to a real file), same relay-safe methodology
        "e2e_png_s": round(e2e_elapsed, 4),
        "e2e_png_vs_baseline": round(1.0 / e2e_elapsed, 2),
        # attribution: infra floor vs software cost (see comments above)
        "readback_floor_s": round(readback_floor, 4),
        "png_software_s": round(png_software, 4),
        # relay-health control (median trivial dispatch round trip,
        # ~0.04 s healthy) for the best attempt; every attempt with its
        # own control rides alongside so a degraded window is visible
        "relay_dispatch_rt_s": round(dispatch_rt, 4),
        "e2e_attempts": e2e_attempts,
        # the reference's other output format, same contract (< 1 s e2e):
        # whole-plane readback + striped Paeth/zlib-6 encode to a file
        "e2e_depthmap_png_s": dm_best["e2e_png_s"],
        "depthmap_readback_floor_s": dm_best["readback_floor_s"],
        "depthmap_png_software_s": round(dm_software, 4),
        "depthmap_attempts": dm_attempts,
        # BASELINE config 5: batch-4 forward throughput, device-side
        # (reachable via the CLI's --batch-size / api.process_batch)
        "batch4_imgs_per_s": round(1.0 / batch_per_image, 2),
        # whole-model roofline accounting (flops.py): logical model FLOPs
        # per image and the resulting MFU vs the chip's dense bf16 peak
        # for the headline and batch-4 paths (None off-TPU)
        "model_tflops": round(ledger["total"] / 1e12, 4),
        "mfu": (round(mfu_headline, 4) if mfu_headline else None),
        "batch4_mfu": (round(me_flops.mfu(
            ledger["total"], batch_per_image, peak), 4) if peak else None),
        # --dtype mixed: device wall-clock, depth-map e2e and MFU of the
        # best-accuracy-per-byte mode (None when BENCH_DTYPE pins a mode)
        "mixed_device_s": (round(mixed_device, 4) if mixed_device else None),
        "mixed_e2e_depthmap_png_s": (round(mixed_dm, 4) if mixed_dm else None),
        "mixed_mfu": (round(mixed_mfu, 4) if mixed_mfu else None),
    }))


def _retry_if_backend_down(exc: BaseException) -> None:
    """Don't let a transient relay outage zero out an unattended bench run.

    The dev TPU tunnel drops for minutes at a time; a failed backend init
    is cached for the life of the JAX process, so recovery = probe in a
    subprocess until the backend answers, then re-exec this script fresh.
    Bounded by BENCH_BACKEND_RETRIES (decremented across execs); any
    non-backend error re-raises immediately.
    """
    import subprocess

    msg = str(exc)
    if "UNAVAILABLE" not in msg and "backend" not in msg.lower():
        raise exc
    tries = int(os.environ.get("BENCH_BACKEND_RETRIES", "8"))
    delay = int(os.environ.get("BENCH_BACKEND_RETRY_DELAY_S", "120"))
    for i in range(tries):
        print(f"bench: backend unavailable, probe {i + 1}/{tries}",
              file=sys.stderr, flush=True)
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=900)
            ok = probe.returncode == 0
        except subprocess.SubprocessError:
            ok = False
        if ok:
            env = dict(os.environ, BENCH_BACKEND_RETRIES=str(tries - 1 - i))
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                      env)
        time.sleep(delay)
    raise exc


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # pragma: no cover - exercised only on outages
        _retry_if_backend_down(e)
