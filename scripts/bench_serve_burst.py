"""HTTP burst throughput: K concurrent uploads against a --max-batch server.

The BASELINE config-5 number through the PRODUCT HTTP surface: a real
ThreadingHTTPServer (serve.create_server) on an ephemeral port, a real
checkpoint session, K client threads each POSTing the photo and reading
the full response, wall-clocked end to end. Measures both --max-batch=N
(leader-follower micro-batching, serve._MicroBatcher) and --max-batch=1
(strict serialized forwards) so the coalescing win is a measured ratio,
not a structural claim.

Usage (on the chip; serialize TPU work -- nothing else may use the device):
  python scripts/bench_serve_burst.py \
      --checkpoint /tmp/ckpt_full/depth_pro.pt --photo /tmp/ckpt_full/photo.jpg \
      --out docs/perf/serve_burst_r5.json

Prints one JSON line and (with --out) writes it as the committed artifact.
CPU smoke: tests/test_serve_burst_script.py runs main() on a TINY
checkpoint -- same code path, minutes -> seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _post(url: str, body: bytes, retries: int = 50) -> int:
    """POST and drain the response in chunks; honour 503 + Retry-After
    (the server's load-shed contract) like a production client would."""
    for _ in range(retries):
        req = urllib.request.Request(url, data=body, method="POST")
        try:
            with urllib.request.urlopen(req) as r:
                n = 0
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        return n
                    n += len(chunk)
        except urllib.error.HTTPError as e:
            if e.code != 503:
                raise
            time.sleep(0.2)
    raise RuntimeError("server kept replying 503")


def _relay_control() -> float:
    import numpy as np

    import jax
    import jax.numpy as jnp

    rts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jnp.sum(jnp.zeros((8,), jnp.float32) + jnp.float32(i + 1)))
        rts.append(time.perf_counter() - t0)
    return round(sorted(rts)[1], 4)


def _run_mode(session, photo: bytes, max_batch: int, requests: int,
              concurrency: int, fmt: str) -> dict:
    from matrix_eyes_tpu.serve import create_server

    server = create_server(session, port=0, max_inflight=concurrency + 4,
                           max_batch=max_batch)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = (f"http://127.0.0.1:{server.server_address[1]}"
           f"/v1/process?format={fmt}&focal-length=35")
    try:
        # warm: compile every pow-2 batch shape the burst can hit,
        # DETERMINISTICALLY -- a concurrent warm volley's coalescing is
        # timing-dependent (it may only form batches of 1 and 4, leaving
        # shape 2 to compile inside the measured window), so drive the
        # batched forward directly at each padded shape first
        import tempfile

        from matrix_eyes_tpu.io.image import load_source_image

        with tempfile.NamedTemporaryFile(suffix=".bin") as f:
            f.write(photo)
            f.flush()
            src = load_source_image(f.name, 35.0)
        b = 1
        top = 1 << (max_batch - 1).bit_length()  # the largest PADDED shape
        while b <= top:
            for dm in session.depth_maps([src] * min(b, max_batch),
                                         pad_to_pow2=True):
                dm.data.block_until_ready()
            b *= 2
        # then one HTTP request + one full-concurrency volley to warm the
        # render/encode path end-to-end
        _post(url, photo)
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            list(pool.map(lambda _i: _post(url, photo), range(concurrency)))
            # measured burst: 'requests' uploads, 'concurrency' in flight
            t0 = time.perf_counter()
            sizes = list(pool.map(lambda _i: _post(url, photo),
                                  range(requests)))
            wall = time.perf_counter() - t0
        assert all(s > 0 for s in sizes)
        return {"max_batch": max_batch, "requests": requests,
                "concurrency": concurrency,
                "wall_s": round(wall, 3),
                "requests_per_s": round(requests / wall, 3),
                # relay-health control (same honesty mechanism as
                # bench.py): median trivial dispatch+readback round trip
                # AT MEASUREMENT TIME -- ~0.04 s healthy on the dev
                # tunnel, much larger marks a degraded window, and the
                # two modes run minutes apart so each carries its own
                "relay_dispatch_rt_s": _relay_control()}
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="/tmp/ckpt_full/depth_pro.pt")
    ap.add_argument("--photo", default="/tmp/ckpt_full/photo.jpg")
    ap.add_argument("--format", default="depthmap",
                    choices=["depthmap", "stereogram"])
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--skip-serialized", action="store_true",
                    help="measure only the micro-batched mode")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args(argv)

    from matrix_eyes_tpu.api import MatrixEyes

    with open(args.photo, "rb") as f:
        photo = f.read()
    session = MatrixEyes(args.checkpoint)

    import jax

    report = {
        "metric": "serve_burst_http",
        "format": args.format,
        "photo_bytes": len(photo),
        "device": getattr(jax.devices()[0], "device_kind", "unknown"),
        "batched": _run_mode(session, photo, args.max_batch, args.requests,
                             args.concurrency, args.format),
    }
    if not args.skip_serialized:
        report["serialized"] = _run_mode(session, photo, 1, args.requests,
                                         args.concurrency, args.format)
        report["coalescing_speedup"] = round(
            report["batched"]["requests_per_s"]
            / report["serialized"]["requests_per_s"], 3)
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
