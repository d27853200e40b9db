"""Top-level orchestration: image -> depth -> output file.

Mirrors ``reconstruction::extract_depth`` (reconstruction.rs:155-205):
load + preprocess the source image, derive the normalised focal length from
EXIF/flag if available, run the model (FOV head otherwise), wrap the result
in a DepthMap and dispatch the requested output.

The image enters HBM once (the raw u8 decode) and everything through the
final output pixels stays on device.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import ModelConfig, RuntimeConfig
from matrix_eyes_tpu.io.image import SourceImage, load_source_image
from matrix_eyes_tpu.models import depth_pro
from matrix_eyes_tpu.ops.resize import resize_lanczos3, to_u8
from matrix_eyes_tpu.output.depthmap import DepthMap, ImageOutputFormat, VertexMode
from matrix_eyes_tpu.progress import SplitProgressListener


@partial(jax.jit, static_argnames=("img_size", "dtype"))
def preprocess_image(rgb_u8: jnp.ndarray, img_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Device preprocessing (reconstruction.rs:93-124): Lanczos3 resize to
    the model resolution, round back to u8 (the reference resizes the u8
    image before tensorising), scale to [0,1], normalise mean=std=0.5.
    Returns (1, S, S, 3) NHWC."""
    x = resize_lanczos3(rgb_u8.astype(jnp.float32), img_size, img_size)
    x = to_u8(x).astype(jnp.float32)
    x = x / 255.0
    x = (x - 0.5) / 0.5
    return x[None].astype(dtype)


def extract_depth_batch(
    cfg: ModelConfig,
    params: Dict[str, Any],
    jobs,
    batch_size: int,
    focal_length_35mm: Optional[float] = None,
    image_format: ImageOutputFormat = ImageOutputFormat.DEPTH_MAP,
    vertex_mode: VertexMode = VertexMode.COLOR,
    resize_scale: Optional[float] = None,
    stereo_amplitude: float = 1.0 / 16.0,
    runtime: Optional[RuntimeConfig] = None,
    progress=None,
    mesh=None,
    need_fov: Optional[bool] = None,
) -> None:
    """Batched pipeline over many images: ONE forward per ``batch_size``
    photos (BASELINE config 5 wired into the product surface).

    The batch rides the encoder's pyramid patch axis (35 patches per image,
    encoder.rs:142-156's split axis), so per-image device cost drops well
    below single-image latency and scales across a ``mesh``'s data axis.
    Semantics match running :func:`extract_depth` per image -- per-image
    EXIF focal lengths, per-image output geometry, the same stage-specific
    failure messages -- except that images sharing a chunk go through one
    XLA program (a different executable than the single-image one, so f32
    sums may associate differently at the last ulp).

    ``jobs``: sequence of ``(source_path, destination_path)``.
    ``need_fov``: whether some image lacks a focal length (the caller
    probed EXIF headers already; ``None`` = decide per chunk). When True,
    the FOV head runs for the whole batch and per-image known focals
    override its estimate (models.depth_pro.forward_with_mixed_fnorm).

    Chunks are padded to ``batch_size`` by repeating the last image so
    every chunk replays the SAME compiled executable (static shapes: one
    AOT entry per batch size, not one per remainder).

    Output writing is pipelined one chunk behind the forward: chunk k's
    render programs are dispatched right after its own forward (via
    DepthMap.prepare_output, so they enter the per-device FIFO queue
    BEFORE chunk k+1's forward), and the host-bound tail -- the blocking
    readback + PNG/mesh encode -- runs after chunk k+1's forward has been
    dispatched, riding that forward's device time instead of serialising
    with it. Nothing here reorders files on disk: outputs stay
    byte-identical to the unpipelined loop (tests/test_cli.py
    test_cli_batch_size_outputs_match_batch1).

    Failure isolation matches the reference's one-process-per-image
    design (main.rs:161-172 exits per image): a failing decode, render or
    write skips THAT image with the canonical per-stage message on stderr
    and the rest of the directory still completes; at the end the run
    raises one summary ReconstructionError ("N of M images failed") so
    the CLI exits 1. Model/preprocess failures (systemic, whole-chunk)
    still abort the run, after flushing any finished chunk."""
    runtime = runtime or RuntimeConfig()
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    import contextlib
    import sys
    from concurrent.futures import ThreadPoolExecutor

    from matrix_eyes_tpu import aot, timings
    from matrix_eyes_tpu.config import configure_matmul_precision
    from matrix_eyes_tpu.errors import MatrixEyesError, ReconstructionError
    from matrix_eyes_tpu.output.depthmap import maybe_prefetch_stereo_noise

    def stage_error(msg: str, err: Exception):
        print(f"{msg}: {err}", file=sys.stderr)
        if isinstance(err, MatrixEyesError):
            return err
        return ReconstructionError(f"{msg}: {err}")

    rt_dtype = runtime.image_dtype()
    configure_matmul_precision(rt_dtype, runtime.mixed_bf16)
    use_flash = runtime.use_flash_attention()

    jobs = list(jobs)
    chunks = [jobs[i:i + batch_size] for i in range(0, len(jobs), batch_size)]

    def pre(rgb):
        return preprocess_image.__wrapped__(rgb, cfg.img_size, rt_dtype)

    salt = f"{cfg!r}|flash={use_flash}"
    if mesh is not None:
        from matrix_eyes_tpu.parallel import patch_sharded, shard_batch

        salt += f"|mesh={dict(mesh.shape)}"

    def decode(path):
        return load_source_image(path, focal_length_35mm)

    # Decode chunk k+1 on a worker thread while chunk k runs on the device
    # (same overlap as the single-image batch loop in cli.run). Failures
    # are re-raised when the prefetched result is consumed, with the
    # canonical per-stage message naming the failing file.
    pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="me-decode") \
        if len(chunks) > 1 else None
    next_futs = None

    # Progress windows are allocated in EXECUTION order (model c0, model c1,
    # out c0, model c2, out c1, ...) from a running cursor so the console
    # bar stays monotone under the one-chunk-behind output pipeline.
    model_w = 0.9 / len(chunks)
    out_w = 0.1 / len(chunks)
    cursor = 0.0

    def take(width: float) -> SplitProgressListener:
        nonlocal cursor
        lo = cursor
        cursor = min(1.0, cursor + width)
        return SplitProgressListener(progress, lo, cursor)

    # (jobs, zero-arg writers) of the forward-complete-but-unwritten chunk
    pending = None
    # (out_path, error) per skipped image; one summary error at the end
    failures = []

    def flush_pending() -> None:
        nonlocal pending
        if pending is None:
            return
        p_jobs, p_writers = pending
        pending = None
        pl_out = take(out_w)
        pl_out.update_message("writing output")
        for (_src_path, out_path), write in zip(p_jobs, p_writers):
            try:
                with timings.span("write output"):
                    write()
            except Exception as err:
                failures.append((out_path, stage_error(
                    f"Failed to output result {out_path}", err)))
        pl_out.report_status(1.0)

    try:
        for ci, chunk in enumerate(chunks):
            pl_model = take(model_w)
            futs, next_futs = next_futs, None
            pl_model.update_message("loading source images")
            live = []  # ((src_path, out_path), SourceImage) that decoded
            for j, (src_path, out_path) in enumerate(chunk):
                try:
                    with timings.span("decode source image"):
                        src = futs[j].result() if futs is not None \
                            else decode(src_path)
                    live.append(((src_path, out_path), src))
                except Exception as err:
                    failures.append((out_path, stage_error(
                        f"Failed to load source image {src_path}", err)))

            # kick off the NEXT chunk's decodes before this chunk's device
            # work so they overlap it
            if pool is not None and ci + 1 < len(chunks):
                next_futs = [pool.submit(decode, p)
                             for p, _o in chunks[ci + 1]]

            if not live:
                flush_pending()
                pl_model.report_status(1.0)
                continue
            srcs = [s for _job, s in live]
            try:
                with timings.span("preprocess (device)"):
                    imgs = [aot.call_cached(
                        "preprocess", pre, (jnp.asarray(s.rgb),),
                        salt=f"{cfg.img_size}|{jnp.dtype(rt_dtype)}")
                        for s in srcs]
                    pad = batch_size - len(live)
                    img = jnp.concatenate(imgs + [imgs[-1]] * pad)
                    if mesh is not None:
                        img = shard_batch(img, mesh)
            except Exception as err:
                # device-side preprocessing/assembly, not file decode: blame
                # the right stage (decode failures are caught above, per file)
                raise stage_error("Failed to process image", err) from err

            f_norms = [s.f_norm() for s in srcs]
            f_norms = f_norms + [f_norms[-1]] * pad
            # Stereogram noise planes depend only on (seed, geometry):
            # prefetch every image's BEFORE the forward so their transfers
            # ride the link while the device computes the whole batch.
            noises = [maybe_prefetch_stereo_noise(
                out, image_format, s.original_size, resize_scale,
                stereo_amplitude, runtime.seed)
                for (_s, out), s in live]

            pl_model.update_message("extracting depth")
            try:
                shard_ctx = patch_sharded(mesh) if mesh is not None \
                    else contextlib.nullcontext()
                fov = need_fov if need_fov is not None \
                    else any(f is None for f in f_norms)
                if fov and "fov" not in params:
                    raise ReconstructionError(
                        "Model error: an image carries no focal length but "
                        "the FOV weights were not loaded")
                with timings.span("model forward"), shard_ctx:
                    if not fov:
                        def fwd(p, im, f):
                            return depth_pro.forward_with_fnorm.__wrapped__(
                                cfg, p, im, f, use_flash)

                        inv = aot.call_cached(
                            f"fwd_fnorm_b{batch_size}", fwd,
                            (params, img, jnp.asarray(f_norms, jnp.float32)),
                            salt)
                    else:
                        def fwd(p, im, f, h):
                            return depth_pro.forward_with_mixed_fnorm.__wrapped__(
                                cfg, p, im, f, h, use_flash)

                        f_arr = jnp.asarray(
                            [f if f is not None else 1.0 for f in f_norms],
                            jnp.float32)
                        has_f = jnp.asarray(
                            [f is not None for f in f_norms])
                        inv, _fov_deg = aot.call_cached(
                            f"fwd_mixed_b{batch_size}", fwd,
                            (params, img, f_arr, has_f), salt)
                    if timings.enabled():
                        inv.block_until_ready()
            except Exception as err:
                raise stage_error("Failed to process image", err) from err
            pl_model.report_status(1.0)

            # Dispatch THIS chunk's render programs before anything else
            # (the pending flush below, the next iteration's forward)
            # enters the device queue: per-device execution is FIFO, so
            # this is what lets the NEXT flush's blocking readback complete
            # without waiting out a whole later forward.
            writers, w_jobs = [], []
            for i, ((src_path, out_path), s) in enumerate(live):
                try:
                    # prepare_output records its own "output: render
                    # dispatch" spans; no outer span (it would double-count)
                    writers.append(
                        DepthMap.new(inv[i], s.original_size)
                        .prepare_output(
                            out_path,
                            src_path,
                            image_format=image_format,
                            vertex_mode=vertex_mode,
                            resize_scale=resize_scale,
                            amplitude=stereo_amplitude,
                            seed=runtime.seed,
                            stereo_noise=noises[i],
                        ))
                    w_jobs.append((src_path, out_path))
                except Exception as err:
                    failures.append((out_path, stage_error(
                        f"Failed to output result {out_path}", err)))

            # chunk ci's forward + renders are queued on the device; write
            # the PREVIOUS chunk's files now so its readback + encode
            # overlap this chunk's compute
            flush_pending()
            pending = (w_jobs, writers)
        flush_pending()
    except Exception:
        # a systemic failure in chunk k+1 must not lose chunk k's finished
        # forward; flushing first also preserves the sequential loop's
        # error order (chunk k's output errors surfaced before chunk
        # k+1's). KeyboardInterrupt/SystemExit propagate immediately --
        # no burst of file writes on a Ctrl-C.
        flush_pending()
        raise
    finally:
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
    if failures:
        # Per-image isolation (the reference's one-process-per-image exit
        # contract, main.rs:161-172): every failure already printed its
        # canonical stage message; surface one summary so the CLI exits 1.
        raise ReconstructionError(
            f"{len(failures)} of {len(jobs)} images failed")


def extract_depth(
    cfg: ModelConfig,
    params: Dict[str, Any],
    source_path: str,
    destination_path: str,
    focal_length_35mm: Optional[float] = None,
    image_format: ImageOutputFormat = ImageOutputFormat.DEPTH_MAP,
    vertex_mode: VertexMode = VertexMode.COLOR,
    resize_scale: Optional[float] = None,
    stereo_amplitude: float = 1.0 / 16.0,
    runtime: Optional[RuntimeConfig] = None,
    progress=None,
    source: Optional[SourceImage] = None,
    mesh=None,
) -> None:
    """Full pipeline for one image (reconstruction.rs:155-205).

    ``mesh``: an optional ``parallel.make_mesh(...)`` device mesh. ``params``
    must already be placed with ``parallel.shard_params`` over it; the
    forward then runs with the pyramid patch batch sharded over the mesh's
    data axis and the ViT blocks tensor-parallel over its model axis
    (the CLI's ``--devices`` flag)."""
    runtime = runtime or RuntimeConfig()
    pl = SplitProgressListener(progress)
    pl_model, pl_out = pl.split_range(0.9)
    pl_pre, pl_net = pl_model.split_range(0.05)

    import sys

    from matrix_eyes_tpu.errors import MatrixEyesError, ReconstructionError

    def stage_error(msg: str, err: Exception, stage: str):
        print(f"{msg}: {err}", file=sys.stderr)
        out = err if isinstance(err, MatrixEyesError) \
            else ReconstructionError(f"{msg}: {err}")
        # which pipeline stage failed: the CLI's directory loop isolates
        # per-image stages (load/output) but aborts on model-stage
        # failures, which are systemic (device/weights), not per-image
        out.stage = stage
        return out

    # Stage-specific failure reporting mirrors the reference
    # (reconstruction.rs:167-203: each stage eprintln's its own message
    # before the error propagates to main's exit(1)).
    pl_pre.update_message("loading source image")
    try:
        from matrix_eyes_tpu import timings

        with timings.span("decode source image"):
            src = source if source is not None else load_source_image(
                source_path, focal_length_35mm)
        f_norm = src.f_norm()
        from matrix_eyes_tpu import aot
        from matrix_eyes_tpu.config import configure_matmul_precision

        rt_dtype = runtime.image_dtype()
        configure_matmul_precision(rt_dtype, runtime.mixed_bf16)

        def pre(rgb):
            return preprocess_image.__wrapped__(rgb, cfg.img_size, rt_dtype)

        with timings.span("preprocess (device)"):
            img = aot.call_cached("preprocess", pre, (jnp.asarray(src.rgb),),
                                  salt=f"{cfg.img_size}|{jnp.dtype(rt_dtype)}")
        if mesh is not None:
            # Replicate the image over the mesh so every input of the sharded
            # forward lives on the mesh's devices (mixing a single-device
            # committed array with mesh-sharded parameters is an error).
            from jax.sharding import NamedSharding, PartitionSpec

            img = jax.device_put(img, NamedSharding(mesh, PartitionSpec()))
    except Exception as err:
        raise stage_error("Failed to load source image", err, "load") from err
    pl_pre.report_status(1.0)

    # Stereogram noise prefetch: the noise plane depends only on
    # (seed, output geometry), both known before the forward runs, so its
    # device->host transfer (~3*pw bytes/row, a third of the compact
    # stereogram's bytes) rides the link while the device computes depth.
    from matrix_eyes_tpu.output.depthmap import maybe_prefetch_stereo_noise

    stereo_noise = maybe_prefetch_stereo_noise(
        destination_path, image_format, src.original_size, resize_scale,
        stereo_amplitude, runtime.seed)

    pl_net.update_message("extracting depth")
    try:
        use_flash = runtime.use_flash_attention()
        # The model forward goes through the AOT executable cache: a warm
        # CLI run deserializes the compiled binary instead of re-tracing and
        # re-compiling (the reference's instant-binary property,
        # main.rs:149-173). Falls back to plain jit when disabled.
        from matrix_eyes_tpu import aot

        salt = f"{cfg!r}|flash={use_flash}"
        import contextlib

        if mesh is not None:
            from matrix_eyes_tpu.parallel import patch_sharded

            # The patch-sharding context changes what gets traced (sharding
            # constraints inside the encoder), so it must be part of the AOT
            # cache key alongside the arg shardings.
            salt += f"|mesh={dict(mesh.shape)}"
            shard_ctx = patch_sharded(mesh)
        else:
            shard_ctx = contextlib.nullcontext()
        from matrix_eyes_tpu import timings

        with timings.span("model forward"), shard_ctx:
            if f_norm is not None:
                def fwd_fnorm(p, im, f):
                    return depth_pro.forward_with_fnorm.__wrapped__(
                        cfg, p, im, f, use_flash)

                inverse_depth = aot.call_cached(
                    "fwd_fnorm", fwd_fnorm,
                    (params, img, jnp.float32(f_norm)), salt)[0]
            else:
                def fwd_fov(p, im):
                    return depth_pro.forward_with_fov.__wrapped__(cfg, p, im, use_flash)

                inv, _fov_deg = aot.call_cached("fwd_fov", fwd_fov, (params, img), salt)
                inverse_depth = inv[0]
            depth_map = DepthMap.new(inverse_depth, src.original_size)
            if timings.enabled():
                # Observability mode only: force the forward's completion
                # inside ITS span. Dispatch is asynchronous, so without
                # this the first blocking readback (the output stage)
                # absorbs the forward's wall time -- on a remote relay the
                # first execution of a freshly loaded executable can cost
                # tens of seconds (docs/PERFORMANCE.md one-shot forensic)
                # and the table would blame the write path for it.
                depth_map.data.block_until_ready()
    except Exception as err:
        raise stage_error("Failed to process image", err, "model") from err
    pl_net.report_status(1.0)

    pl_out.update_message("writing output")
    try:
        from matrix_eyes_tpu import timings

        with timings.span("write output"):
            depth_map.output_image(
                destination_path,
                source_path,
                image_format=image_format,
                vertex_mode=vertex_mode,
                resize_scale=resize_scale,
                amplitude=stereo_amplitude,
                seed=runtime.seed,
                stereo_noise=stereo_noise,
            )
    except Exception as err:
        raise stage_error("Failed to output result", err, "output") from err
    pl_out.report_status(1.0)
