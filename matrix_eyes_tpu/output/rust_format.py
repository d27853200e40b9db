"""Rust ``{}`` Display-compatible formatting for f64 values.

The reference writes OBJ floats with Rust's Display (output.rs:577-598),
which prints the shortest decimal string that round-trips -- like Python's
repr -- but *never* uses exponent notation and drops a trailing ``.0``
(``1.0`` -> ``1``, ``1e-7`` -> ``0.0000001``). Both languages implement the
same shortest-round-trip-closest rule, so converting Python's repr to
positional notation reproduces Rust's output.
"""

from __future__ import annotations

import math


def format_f64(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    s = repr(float(v))
    if "e" in s or "E" in s:
        s = s.replace("E", "e")
        mant, exp = s.split("e")
        exp = int(exp)
        neg = mant.startswith("-")
        if neg:
            mant = mant[1:]
        if "." in mant:
            ip, fp = mant.split(".")
        else:
            ip, fp = mant, ""
        digits = ip + fp
        point = len(ip) + exp
        if point <= 0:
            out = "0." + "0" * (-point) + digits
        elif point >= len(digits):
            out = digits + "0" * (point - len(digits))
        else:
            out = digits[:point] + "." + digits[point:]
        s = "-" + out if neg else out
    if s.endswith(".0"):
        s = s[:-2]
    return s
