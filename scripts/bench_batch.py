"""Secondary benchmark: batched multi-photo throughput on the local chip(s).

BASELINE.md config 5 is "pyramid patches sharded across v5e-8"; with one
local chip this measures the single-chip batched throughput (images/s at
batch N), and with more devices present it shards the batch over the
(data, model) mesh exactly like tests/test_parallel.py.

Run: PYTHONPATH=. python scripts/bench_batch.py [batch]
Prints one JSON line (not the driver headline; see bench.py for that).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(batch: int = 4) -> None:
    from matrix_eyes_tpu.config import DEPTH_PRO, RuntimeConfig, enable_compilation_cache
    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models.init import init_params_fast

    enable_compilation_cache()
    cfg = DEPTH_PRO
    runtime = RuntimeConfig()
    dtype = runtime.resolved_dtype()
    use_flash = runtime.use_flash_attention()
    params = jax.block_until_ready(init_params_fast(cfg, dtype=dtype))

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        from matrix_eyes_tpu.parallel import make_mesh, shard_batch, shard_params

        mesh = make_mesh(n_dev, model=1)
        params = shard_params(params, mesh)

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    img = jnp.asarray(
        rng.uniform(-1, 1, (batch, cfg.img_size, cfg.img_size, 3)).astype(np.float32),
        dtype)
    if mesh is not None:
        from matrix_eyes_tpu.parallel import shard_batch

        img = shard_batch(img, mesh)
    img.block_until_ready()

    @jax.jit
    def step(img, s):
        inv, fov = depth_pro.forward_with_fov.__wrapped__(
            cfg, params, img + s.astype(img.dtype), use_flash)
        return jnp.sum(inv, dtype=jnp.float32)

    def run(s):
        if mesh is None:
            return step(img, s)
        from matrix_eyes_tpu.parallel import patch_sharded

        with patch_sharded(mesh):
            return step(img, s)

    _ = np.asarray(run(jnp.float32(0.0)))
    iters = 6
    t0 = time.perf_counter()
    outs = [run(jnp.float32(i + 1)) for i in range(iters)]
    _ = [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"batched_depth_throughput_b{batch}_d{n_dev}",
        "value": round(batch / dt, 3),
        "unit": "images/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
