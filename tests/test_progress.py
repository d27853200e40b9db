"""ProgressListener protocol, recursive range splitting, console bar
(progress.py; reference mod.rs:366-418, reconstruction.rs:207-238)."""

import io

from matrix_eyes_tpu.progress import ConsoleProgressReporter, SplitProgressListener


class _Recorder:
    def __init__(self):
        self.positions = []
        self.messages = []

    def report_status(self, pos):
        self.positions.append(pos)

    def update_message(self, msg):
        self.messages.append(msg)


def test_split_range_maps_child_progress_into_parent_slice():
    rec = _Recorder()
    root = SplitProgressListener(rec)
    left, right = root.split_range(0.25)

    left.report_status(0.0)
    left.report_status(1.0)
    right.report_status(0.0)
    right.report_status(0.5)
    right.report_status(1.0)
    assert rec.positions == [0.0, 0.25, 0.25, 0.625, 1.0]


def test_split_is_recursive():
    rec = _Recorder()
    root = SplitProgressListener(rec)
    _, right = root.split_range(0.5)          # [0.5, 1.0]
    rl, rr = right.split_range(0.5)           # [0.5, 0.75], [0.75, 1.0]
    rl.report_status(1.0)
    rr.report_status(0.5)
    assert rec.positions == [0.75, 0.875]
    rr.update_message("decoding")
    assert rec.messages == ["decoding"]


def test_none_parent_is_a_silent_sink():
    root = SplitProgressListener(None)
    left, right = root.split_range(0.3)
    # must not raise anywhere in the tree
    left.report_status(0.5)
    right.update_message("x")


def test_console_reporter_disabled_on_non_tty():
    buf = io.StringIO()  # no isatty -> False
    rep = ConsoleProgressReporter(stream=buf)
    rep.report_status(0.5)
    rep.update_message("loading")
    rep.finish_and_clear()
    assert buf.getvalue() == ""


class _Tty(io.StringIO):
    def isatty(self):
        return True


def test_console_reporter_renders_bar_percent_and_message():
    buf = _Tty()
    rep = ConsoleProgressReporter(stream=buf)
    rep.update_message("encoder")
    rep.report_status(0.5)
    out = buf.getvalue()
    assert "#" * 20 + "-" * 20 in out  # 40-wide bar, half filled
    assert "50.00%" in out
    assert ": encoder" in out
    assert out.rstrip().endswith("\x1b[K")  # erase-to-eol, single-line render

    rep.report_status(2.0)  # clamped
    assert "100.00%" in buf.getvalue()

    buf2 = _Tty()
    rep2 = ConsoleProgressReporter(stream=buf2)
    rep2.finish_and_clear()
    assert buf2.getvalue() == "\r\x1b[K"
