"""Mesh-parameterised batched-throughput benchmark (BASELINE config 5).

Builds the (data, model) mesh from flags, applies exactly the shardings the
driver dry run uses (pyramid patch batch + image batch over 'data',
Megatron TP with the head-group qkv layout over 'model'), and times the
batched Depth Pro forward on whatever devices exist: one local chip today
(degenerate 1x1 mesh), a real v5e-8 unchanged tomorrow
(``--data 4 --model 2`` etc.).

Alongside images/s it reports the compiled HLO's collective traffic --
bytes moved per step by all-gather / all-reduce / reduce-scatter /
collective-permute / all-to-all -- which is the quantity that bounds how
the measured single-chip number scales over ICI (see docs/SCALING.md).

Run: PYTHONPATH=. python scripts/bench_batch.py [--batch 4] [--data N]
     [--model M] [--iters 6] [--compile-only]
Prints one JSON line (not the driver headline; see bench.py for that).
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def collective_stats(hlo_text: str):
    """Per-op-kind {count, bytes} of collective results in partitioned HLO.

    Bytes count each collective's *result* shape (per participating
    device), the standard first-order measure of ICI traffic per step.
    Tuple-shaped results (grouped all-reduces) sum their elements.
    """
    stats = {}
    shape_re = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(\([^)]*\)|\S+)\s+(%s)\(" % "|".join(_COLLECTIVES), line)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_re.findall(shapes):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES.get(dt, 4)
        s = stats.setdefault(op, {"count": 0, "bytes": 0})
        s["count"] += 1
        s["bytes"] += nbytes
    return stats


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4, help="images per step")
    ap.add_argument("--data", type=int, default=0,
                    help="data-parallel mesh axis (default: n_devices/model)")
    ap.add_argument("--model", type=int, default=1,
                    help="tensor-parallel mesh axis")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--compile-only", action="store_true",
                    help="report mesh + collective stats without timing")
    ap.add_argument("--config", choices=("full", "tiny"), default="full",
                    help="tiny: the test-scale model (exercises the identical "
                         "mesh/sharding path in seconds on a CPU mesh)")
    args = ap.parse_args(argv)

    from matrix_eyes_tpu.config import DEPTH_PRO, TINY, RuntimeConfig, enable_compilation_cache
    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models.init import init_params_fast
    from matrix_eyes_tpu.parallel import (
        make_mesh,
        patch_sharded,
        shard_batch,
        shard_params,
    )

    enable_compilation_cache()
    cfg = TINY if args.config == "tiny" else DEPTH_PRO
    runtime = RuntimeConfig()
    dtype = runtime.resolved_dtype()
    use_flash = runtime.use_flash_attention()

    n_dev = len(jax.devices())
    data = args.data or max(1, n_dev // args.model)
    mesh = make_mesh(data * args.model, model=args.model)

    params = init_params_fast(cfg, dtype=dtype)
    params = shard_params(params, mesh, num_heads=cfg.num_heads)

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    img = jnp.asarray(
        rng.uniform(-1, 1, (args.batch, cfg.img_size, cfg.img_size, 3))
        .astype(np.float32), dtype)
    img = shard_batch(img, mesh)
    img.block_until_ready()

    def step(img, s):
        inv, fov = depth_pro.forward_with_fov.__wrapped__(
            cfg, params, img + s.astype(img.dtype), use_flash)
        return jnp.sum(inv, dtype=jnp.float32)

    with patch_sharded(mesh):
        compiled = jax.jit(step).lower(img, jnp.float32(0.0)).compile()
    coll = collective_stats(compiled.as_text())

    record = {
        "metric": f"batched_depth_throughput_b{args.batch}",
        "config": args.config,
        "mesh": {"data": data, "model": args.model},
        "devices": n_dev,
        "unit": "images/s",
        "vs_baseline": None,
        "collectives": coll,
        "collective_bytes_per_step": sum(s["bytes"] for s in coll.values()),
    }

    if not args.compile_only:
        _ = np.asarray(compiled(img, jnp.float32(0.0)))
        t0 = time.perf_counter()
        outs = [compiled(img, jnp.float32(i + 1.0)) for i in range(args.iters)]
        _ = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / args.iters
        record["value"] = round(args.batch / dt, 3)
        record["step_s"] = round(dt, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
