"""CPU smoke of scripts/bench_serve_burst.py: the HTTP burst-throughput
artifact generator runs the exact code path (real server, concurrent
uploads, both modes) on the TINY checkpoint, so a serve/API refactor
cannot silently break the on-chip measurement."""

import io
import json
import os
import sys

import numpy as np
import torch
from PIL import Image

import torch_ref

from matrix_eyes_tpu.config import TINY


def test_burst_script_smoke(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import bench_serve_burst

    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=3)
    ckpt = tmp_path / "tiny.pt"
    torch.save(tm.state_dict(), str(ckpt))
    rng = np.random.RandomState(11)
    jpeg = io.BytesIO()
    Image.fromarray(rng.randint(0, 256, (48, 64, 3), np.uint8)).save(
        jpeg, format="JPEG")
    photo = tmp_path / "p.jpg"
    photo.write_bytes(jpeg.getvalue())
    out = tmp_path / "burst.json"

    report = bench_serve_burst.main([
        "--checkpoint", str(ckpt), "--photo", str(photo),
        "--max-batch", "2", "--requests", "4", "--concurrency", "2",
        "--out", str(out)])

    assert report["batched"]["requests_per_s"] > 0
    assert report["serialized"]["requests_per_s"] > 0
    assert report["coalescing_speedup"] > 0
    with open(out) as f:
        assert json.load(f)["metric"] == "serve_burst_http"
