"""bench.py is the artifact the driver records every round (BENCH_r0*.json);
this smoke test runs the whole script at test scale so a refactor cannot
silently break its JSON contract."""

import importlib.util
import json
import os

import pytest


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("photo", [
    "96x128",   # compact (shift, noise) save path
    "64x4200",  # width > 4080: shifts exceed u8, the resolved-RGB banded
                # fallback must engage instead of crashing (review finding)
])
def test_bench_json_contract(monkeypatch, capsys, photo):
    from matrix_eyes_tpu.native import pngwriter

    if not pngwriter.available():
        pytest.skip("native PNG encoder unavailable")
    monkeypatch.setenv("BENCH_CONFIG", "tiny")
    monkeypatch.setenv("BENCH_PHOTO", photo)
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_E2E_ATTEMPTS", "1")
    _load_bench().main()

    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "photo1536_to_depth_stereogram_wall_clock"
    assert rec["unit"] == "s"
    for key in ("value", "e2e_png_s", "readback_floor_s", "png_software_s",
                "relay_dispatch_rt_s"):
        assert rec[key] > 0.0, key
    assert rec["vs_baseline"] == pytest.approx(1.0 / rec["value"], rel=0.02)
    assert rec["e2e_png_vs_baseline"] == pytest.approx(
        1.0 / rec["e2e_png_s"], rel=0.02)
    attempts = rec["e2e_attempts"]
    assert attempts and attempts[0]["e2e_png_s"] > 0.0
    # the best attempt is what the headline keys report
    assert rec["e2e_png_s"] == min(a["e2e_png_s"] for a in attempts)
    # roofline accounting: model FLOPs always present; MFU only where the
    # chip's peak is known (None on the CPU test backend)
    assert rec["model_tflops"] > 0.0
    assert rec["mfu"] is None and rec["batch4_mfu"] is None
    # the mixed-mode row rides in the default run (None when BENCH_DTYPE
    # pins a mode -- 'value' measures that mode directly)
    assert rec["mixed_device_s"] > 0.0
    assert rec["mixed_e2e_depthmap_png_s"] > 0.0
