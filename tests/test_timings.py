"""Stage-timing observability: spans, the report table, and the
bench_warm_cli parser that consumes it."""

import importlib.util
import io
import os
import sys

from matrix_eyes_tpu import timings


def _load_bench_warm():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "bench_warm_cli.py")
    spec = importlib.util.spec_from_file_location("bench_warm_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spans_disabled_by_default(monkeypatch):
    monkeypatch.delenv("MATRIX_EYES_TIMINGS", raising=False)
    with timings.span("x"):
        pass
    assert timings.snapshot() == {}
    out = io.StringIO()
    timings.report(out)  # no table when disabled
    assert out.getvalue() == ""


def test_report_round_trips_through_the_parser(monkeypatch):
    monkeypatch.setenv("MATRIX_EYES_TIMINGS", "1")
    with timings.span("weights encoder -> device"):
        pass
    with timings.span("model forward"):
        pass
    with timings.span("model forward"):
        pass
    snap = timings.snapshot()
    assert snap["model forward"][0] == 2
    out = io.StringIO()
    timings.report(out)
    text = out.getvalue()
    assert "-- timings (wall clock) --" in text
    assert "process total" in text

    parsed = _load_bench_warm().parse_timings(text)
    assert set(parsed) >= {"weights encoder -> device", "model forward"}
    # the trailing summary row is not a pipeline stage: publishing it in
    # the bench JSON's stages dict invites double-counting
    assert "process total" not in parsed
    assert all(v >= 0.0 for v in parsed.values())
    # report() resets
    assert timings.snapshot() == {}


def test_report_clears_even_on_exceptions(monkeypatch):
    monkeypatch.setenv("MATRIX_EYES_TIMINGS", "1")
    try:
        with timings.span("failing stage"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    # the span still recorded its duration
    assert "failing stage" in timings.snapshot()
    timings.report(io.StringIO())


def test_parse_ignores_unrelated_stderr():
    mod = _load_bench_warm()
    text = ("Matrix Eyes version 0.1.0\n"
            "some warning\n"
            "-- timings (wall clock) --\n"
            "  read .pt checkpoint      0.012 s\n"
            "  model forward           11.866 s x2\n"
            "  process total           15.124 s\n"
            "trailing noise\n")
    parsed = mod.parse_timings(text)
    assert parsed == {"read .pt checkpoint": 0.012,
                      "model forward": 11.866}


def test_cli_prints_table_when_enabled(monkeypatch, capsys):
    # parse-error path exits before any pipeline work, but the finally
    # block must still not crash with timings enabled and nothing recorded
    monkeypatch.setenv("MATRIX_EYES_TIMINGS", "1")
    from matrix_eyes_tpu import cli

    rc = cli.main(["--focal-length=abc", "in.jpg", "out.png"])
    assert rc == 2


if __name__ == "__main__":
    sys.exit(os.system(f"python -m pytest {__file__} -q"))
