"""Command-line interface, flag-compatible with the reference.

The reference hand-rolls ``--flag=value`` parsing (main.rs:36-147) with
these behaviours, all reproduced:

* options are only recognised before the first positional argument;
* a flag without ``=`` -> usage + exit(2); unknown ``--flags`` print
  "Unsupported argument" to stderr but do NOT abort (main.rs:117-119);
* more than two positionals -> usage + exit(2); missing positionals ->
  usage + exit(2); ``--help`` -> usage + exit(0);
* reconstruction failure -> message + exit(1).

TPU-native additions (runtime replacements for the reference's compile-time
cargo features, reconstruction.rs:15-72): ``--dtype=f32|bf16|f16``,
``--seed=N`` (stereogram noise), ``--no-flash-attention``.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import List, Optional

from matrix_eyes_tpu import __version__

USAGE_INSTRUCTIONS = """\
Usage: matrix-eyes [OPTIONS] <IMG_SRC>... <IMG_OUT>

Arguments:
  <IMG_SRC>...  Source image
  <IMG_OUT>     Output image

Options:
      --focal-length=<FOCAL_LENGTH>       Focal length in 35mm equivalent
      --checkpoint-path=<CHECKPOINT_PATH> Path to checkpoint file [default: ./checkpoints/depth_pro.pt]
      --image-output-format=<FORMAT>      Format for output [default: depthmap] [possible values: depthmap, stereogram]
      --resize-scale=<SCALE>              Custom scale for stereogram output [default: 1.0]
      --stereo-amplitude=<AMPLITUDE>      Custom scale for stereogram output [default: 0.0625]
      --mesh=<MESH>                       Mesh options [default: vertex-colors] [possible values: plain, vertex-colors, texture-coordinates]
      --convert-checkpoints               Convert checkpoints into a more efficient format [default: disabled]
      --dtype=<DTYPE>                     Compute/parameter dtype [default: bf16 on TPU, f32 elsewhere] [possible values: f32, bf16, f16, int8, mixed]
      --seed=<SEED>                       Stereogram noise seed [default: 0]
      --devices=<N | DATAxMODEL>          Run sharded over a device mesh, e.g. 8 or 4x2 [default: single device]
      --batch-size=<N>                    Images per forward in directory mode [default: 1]
      --no-flash-attention                Disable the Pallas flash-attention kernel
      --profile=<DIR>                     Write a jax.profiler trace of the run to DIR
      --help                              Print help"""


@dataclass
class Args:
    focal_length: Optional[float] = None
    checkpoint_path: str = "./checkpoints/depth_pro.pt"
    convert_checkpoints: bool = False
    output_format: str = "depthmap"
    resize_scale: Optional[float] = None
    stereo_amplitude: float = 1.0 / 16.0
    vertex_mode: str = "vertex-colors"
    dtype: Optional[str] = None
    seed: int = 0
    devices: Optional[tuple] = None  # (data, model) mesh shape
    batch_size: int = 1
    flash_attention: Optional[bool] = None
    profile_dir: Optional[str] = None
    img_src: str = ""
    img_out: str = ""


def _fail_usage(msg: str, stderr, stdout) -> "SystemExit":
    print(msg, file=stderr)
    print(USAGE_INSTRUCTIONS, file=stdout)
    return SystemExit(2)


def parse_args(argv: List[str], stdout=None, stderr=None) -> Args:
    """Parse argv (without the program name). Raises SystemExit like the
    reference's exit() calls."""
    stdout = stdout or sys.stdout
    stderr = stderr or sys.stderr
    args = Args()

    def parse_value(name: str, value: str, cast):
        try:
            return cast(value)
        except ValueError as err:
            raise _fail_usage(
                f"Argument {name} has an unsupported value {value}: {err}", stderr, stdout)

    for arg in argv:
        if arg.startswith("--") and not args.img_src and not args.img_out:
            if arg == "--convert-checkpoints":
                args.convert_checkpoints = True
                continue
            if arg == "--no-flash-attention":
                args.flash_attention = False
                continue
            if arg == "--help":
                print(USAGE_INSTRUCTIONS, file=stdout)
                raise SystemExit(0)
            if "=" not in arg:
                raise _fail_usage(f"Option flag {arg} has no value", stderr, stdout)
            name, value = arg.split("=", 1)
            if name == "--focal-length":
                args.focal_length = parse_value(name, value, float)
            elif name == "--image-output-format":
                v = value.lower()
                if v not in ("depthmap", "stereogram"):
                    raise _fail_usage(f"Unsupported output format {value}", stderr, stdout)
                args.output_format = v
            elif name == "--resize-scale":
                args.resize_scale = parse_value(name, value, float)
            elif name == "--stereo-amplitude":
                args.stereo_amplitude = parse_value(name, value, float)
            elif name == "--mesh":
                v = value.lower()
                if v not in ("plain", "vertex-colors", "texture-coordinates"):
                    raise _fail_usage(
                        f"Unsupported mesh vertex output mode {value}", stderr, stdout)
                args.vertex_mode = v
            elif name == "--checkpoint-path":
                args.checkpoint_path = value
            elif name == "--dtype":
                from matrix_eyes_tpu.config import parse_dtype_policy

                try:
                    parse_dtype_policy(value)
                except ValueError as err:
                    raise _fail_usage(
                        f"Argument {name} has an unsupported value {value}: {err}",
                        stderr, stdout)
                args.dtype = value
            elif name == "--seed":
                args.seed = parse_value(name, value, int)
            elif name == "--devices":
                def mesh_shape(v: str) -> tuple:
                    parts = v.lower().split("x")
                    if len(parts) > 2:
                        raise ValueError("expected N or DATAxMODEL")
                    dims = [int(p) for p in parts]  # ValueError on junk
                    if any(d < 1 for d in dims):
                        raise ValueError("mesh dimensions must be >= 1")
                    return (dims[0], dims[1] if len(dims) == 2 else 1)

                args.devices = parse_value(name, value, mesh_shape)
            elif name == "--batch-size":
                def batch_size(v: str) -> int:
                    n = int(v)  # ValueError on junk
                    if n < 1:
                        raise ValueError("batch size must be >= 1")
                    return n

                args.batch_size = parse_value(name, value, batch_size)
            elif name == "--profile":
                args.profile_dir = value
            else:
                # the reference only warns and keeps going (main.rs:117-119)
                print(f"Unsupported argument {arg}", file=stderr)
        elif not args.img_src:
            args.img_src = arg
        elif not args.img_out:
            args.img_out = arg
        else:
            raise _fail_usage(f"Unexpected argument {arg}", stderr, stdout)

    if not args.img_src:
        raise _fail_usage("No source image provided", stderr, stdout)
    if not args.img_out:
        raise _fail_usage("No output image provided", stderr, stdout)
    return args


def run(args: Args, progress=None) -> None:
    """Load checkpoint parts (FOV only when needed, like mod.rs:340-359),
    then run the pipeline."""
    from matrix_eyes_tpu.config import (
        RuntimeConfig,
        enable_compilation_cache,
        parse_dtype_policy,
    )

    enable_compilation_cache()
    from matrix_eyes_tpu.io.image import load_source_image
    from matrix_eyes_tpu.output.depthmap import ImageOutputFormat, VertexMode
    from matrix_eyes_tpu.pipeline import extract_depth
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    dtype, quantize_int8, mixed_bf16 = (
        parse_dtype_policy(args.dtype) if args.dtype else (None, False, False))
    runtime = RuntimeConfig(
        dtype=dtype,
        seed=args.seed,
        flash_attention=args.flash_attention,
        quantize_int8=quantize_int8,
        mixed_bf16=mixed_bf16,
    )

    import os

    # --devices=N / DATAxMODEL: run the whole pipeline sharded over a device
    # mesh -- the pyramid patch batch over 'data' (SURVEY.md section 5's
    # natural axis) and Megatron TP over the ViT blocks on 'model'. Same
    # layouts as __graft_entry__.dryrun_multichip, now one CLI flag away.
    # Validated before the checkpoint load so a bad mesh fails fast.
    mesh = None
    if args.devices is not None:
        import jax

        from matrix_eyes_tpu.errors import ReconstructionError
        from matrix_eyes_tpu.parallel import make_mesh

        data, model = args.devices
        n = data * model
        avail = len(jax.devices())
        if n > avail:
            raise ReconstructionError(
                f"Device error: --devices={data}x{model} needs {n} devices "
                f"but only {avail} are available")
        if n > 1:
            mesh = make_mesh(n, model=model)

    batch = os.path.isdir(args.img_src)
    if batch:
        # Batch mode (beyond the reference, which is one image per process):
        # source directory + output directory, one model load for all
        # images, outputs named after the sources.
        if not os.path.isdir(args.img_out):
            from matrix_eyes_tpu.errors import ReconstructionError

            raise ReconstructionError(
                f"IO error: {args.img_out} must be an existing directory when "
                "the source is a directory")
        exts = (".jpg", ".jpeg", ".png")
        sources = sorted(
            os.path.join(args.img_src, n) for n in os.listdir(args.img_src)
            if n.lower().endswith(exts))
        if not sources:
            from matrix_eyes_tpu.errors import ReconstructionError

            raise ReconstructionError(f"IO error: no images in {args.img_src}")
        jobs = []
        out_ext = ".png" if args.output_format in ("depthmap", "stereogram") else ""
        for s in sources:
            stem = os.path.splitext(os.path.basename(s))[0]
            jobs.append((s, os.path.join(args.img_out, stem + (out_ext or ".png")), None))
    else:
        jobs = [(args.img_src, args.img_out,
                 load_source_image(args.img_src, args.focal_length))]

    # FOV weights are only needed without a known focal length
    # (mod.rs:340-359's lazy fov load). In batch mode, probe every image's
    # EXIF up front (header-only, no pixel decode): the FOV network's 0.3 B
    # parameters are loaded only if some image actually lacks a focal length.
    parts = ("encoder", "decoder", "head")
    if batch:
        from matrix_eyes_tpu.io.image import probe_focal_length_35mm

        need_fov = args.focal_length is None and any(
            probe_focal_length_35mm(s) is None for s, _o, _src in jobs)
    else:
        need_fov = jobs[0][2].f_norm() is None
    if need_fov:
        parts = parts + ("fov",)
    # Overlap the two big independent warm-start costs: deserialize cached
    # AOT executables (CPU/disk) on a background thread while the weights
    # upload (network/PCIe). See aot.prefetch_async.
    from matrix_eyes_tpu import aot

    batched = batch and args.batch_size > 1
    if args.batch_size > 1 and not batch:
        print("--batch-size only applies when the source is a directory; "
              "ignored", file=sys.stderr)
    if batched:
        fwd_name = (f"fwd_mixed_b{args.batch_size}" if need_fov
                    else f"fwd_fnorm_b{args.batch_size}")
    else:
        fwd_name = "fwd_fov" if need_fov else "fwd_fnorm"
    aot.prefetch_async((
        "preprocess", fwd_name,
        "stereogram_noise", "stereogram_shift", "stereogram_bands",
        "stereogram",
        "render_depthmap_bands", "render_depthmap_grid", "render_depthmap",
    ))
    cfg, params = load_checkpoint(
        args.checkpoint_path,
        dtype=runtime.resolved_dtype(),
        convert_checkpoints=args.convert_checkpoints,
        parts=parts,
        progress=progress,
        quantize_int8=runtime.quantize_int8,
        mixed_bf16=runtime.mixed_bf16,
    )
    if mesh is not None:
        from matrix_eyes_tpu import timings
        from matrix_eyes_tpu.parallel import shard_params

        with timings.span("shard parameters"):
            params = shard_params(params, mesh, num_heads=cfg.num_heads)
    if batched:
        # --batch-size=N: one forward per N images over the pyramid patch
        # axis (BASELINE config 5 through the product surface). Composes
        # with --devices: the image batch shards over the mesh's data axis.
        from matrix_eyes_tpu.pipeline import extract_depth_batch

        extract_depth_batch(
            cfg,
            params,
            [(s, o) for s, o, _src in jobs],
            args.batch_size,
            focal_length_35mm=args.focal_length,
            image_format=ImageOutputFormat(args.output_format),
            vertex_mode=VertexMode(args.vertex_mode),
            resize_scale=args.resize_scale,
            stereo_amplitude=args.stereo_amplitude,
            runtime=runtime,
            progress=progress,
            mesh=mesh,
            need_fov=need_fov,
        )
        return
    # Batch throughput: decode image k+1 on a worker thread while image k
    # runs on the device (the reference is one image per process,
    # main.rs:149-173; this overlap is free because host JPEG decode and
    # device compute share nothing). JAX dispatch stays on this thread. If
    # a prefetch fails, the job falls back to the pipeline's own decode so
    # the error surfaces with the canonical per-stage message.
    from matrix_eyes_tpu.errors import MatrixEyesError

    decode_pool = None
    next_fut = None
    if len(jobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        decode_pool = ThreadPoolExecutor(max_workers=1,
                                         thread_name_prefix="me-decode")
    failed = 0
    try:
        for i, (src_path, out_path, src) in enumerate(jobs):
            if next_fut is not None:
                try:
                    src = next_fut.result()
                except Exception:
                    src = None  # re-decoded (and re-raised) by the pipeline
                next_fut = None
            if decode_pool is not None and i + 1 < len(jobs):
                next_fut = decode_pool.submit(
                    load_source_image, jobs[i + 1][0], args.focal_length)
            try:
                extract_depth(
                    cfg,
                    params,
                    src_path,
                    out_path,
                    focal_length_35mm=args.focal_length,
                    image_format=ImageOutputFormat(args.output_format),
                    vertex_mode=VertexMode(args.vertex_mode),
                    resize_scale=args.resize_scale,
                    stereo_amplitude=args.stereo_amplitude,
                    runtime=runtime,
                    progress=progress,
                    source=src,
                    mesh=mesh,
                )
            except MatrixEyesError as err:
                # Directory mode gets per-image failure isolation (the
                # reference runs one process per image, main.rs:161-172:
                # a bad photo fails ITS run only). The canonical stage
                # message was already printed by the pipeline; keep going
                # and exit 1 at the end with a summary. Only per-image
                # stages (load/output) are isolated: a model-stage
                # failure is systemic (device/weights) and re-running it
                # on every remaining image would turn an immediate abort
                # into hours of repeated failures.
                if not batch or getattr(err, "stage", None) \
                        not in ("load", "output"):
                    raise
                failed += 1
    finally:
        if decode_pool is not None:
            decode_pool.shutdown(wait=False, cancel_futures=True)
    if failed:
        from matrix_eyes_tpu.errors import ReconstructionError

        raise ReconstructionError(f"{failed} of {len(jobs)} images failed")


def main(argv: Optional[List[str]] = None) -> int:
    print(f"Matrix Eyes version {__version__}")
    try:
        args = parse_args(sys.argv[1:] if argv is None else argv)
    except SystemExit as e:
        return int(e.code or 0)

    from matrix_eyes_tpu.errors import MatrixEyesError
    from matrix_eyes_tpu.progress import ConsoleProgressReporter

    pb = ConsoleProgressReporter()
    try:
        if args.profile_dir:
            # Tracing subsystem: the reference has none (SURVEY.md section 5);
            # here a full device trace is one flag away.
            import contextlib

            import jax

            ctx = jax.profiler.trace(args.profile_dir)
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            run(args, progress=pb)
    except MatrixEyesError as err:
        pb.finish_and_clear()
        print(f"Reconstruction failed: {err}")
        return 1
    finally:
        # Stage wall-clock table (MATRIX_EYES_TIMINGS=1): the warm-start
        # numbers in docs/PERFORMANCE.md regenerate from this.
        pb.finish_and_clear()
        from matrix_eyes_tpu import timings

        timings.report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
