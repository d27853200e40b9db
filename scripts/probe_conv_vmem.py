"""Map the conv3x3 kernel's REAL scoped-VMEM frontier by compiling on-chip.

The admission formula in ops/conv3x3.py models double-buffered streams and
resident weights but not Mosaic's in-kernel temporaries; the one measured
failure (f32 @ 768^2x256, rows=2: real 21.61 MB vs 13.4 MB estimated)
shows the gap scales with the block.  Each compile failure's error text
carries the exact allocation ("Scoped allocation with size X.XXM"), so a
sweep of (dtype, rows, n_skips) at the decoder's shapes gives the real
frontier to calibrate against.

Usage: PYTHONPATH=. python scripts/probe_conv_vmem.py
Emits one JSON line per config: {..., "ok": bool, "real_mb": float|null}
"""
import json
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp


def probe(dtype, rows, n_skips, W=768, cin=256, cout=256, H=None):
    from matrix_eyes_tpu.ops import conv3x3

    if H is None:
        H = rows * 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, H, W, cin)).astype(np.float32), dtype)
    w = jnp.asarray(rng.uniform(-0.1, 0.1, (3, 3, cin, cout)).astype(np.float32), dtype)
    skip = jnp.asarray(rng.uniform(-1, 1, (1, H, W, cout)).astype(np.float32), dtype)
    kw = {}
    if n_skips >= 1:
        kw["skip"] = skip
    if n_skips >= 2:
        kw["skip2"] = skip
    try:
        out = conv3x3.conv3x3_pallas(x, w, None, relu_in=True, rows=rows, **kw)
        jax.block_until_ready(out)
        return True, None
    except Exception as e:  # noqa: BLE001 - compile OOM arrives as JaxRuntimeError
        m = re.search(r"Scoped allocation with size ([0-9.]+)M", str(e))
        return False, (float(m.group(1)) if m else None)


def main():
    from matrix_eyes_tpu.ops.conv3x3 import _pick_rows

    # full-height probes: the H=rows*2 sweep measured that the REAL scoped
    # allocation depends on the grid length (f32 r2 n0 compiles at H=4 but
    # allocates 21.6 MB at H=768), so admission must be validated at
    # production H.
    if sys.argv[1:] == ["fullh"]:
        configs = [(jnp.float32, 4, 2, 0), (jnp.bfloat16, 2, 8, 0),
                   (jnp.bfloat16, 2, 8, 1), (jnp.bfloat16, 2, 4, 1),
                   (jnp.bfloat16, 2, 8, 2), (jnp.bfloat16, 2, 4, 2)]
        for dt, isz, rows, n_skips in configs:
            ok, real = probe(dt, rows, n_skips, H=768)
            print(json.dumps({
                "dtype": str(jnp.dtype(dt)), "rows": rows, "n_skips": n_skips,
                "H": 768, "ok": ok, "real_mb": real,
                "picked": _pick_rows(768, 256, 256, isz, n_skips),
            }), flush=True)
        return

    configs = []
    for dt, isz in ((jnp.bfloat16, 2), (jnp.float32, 4)):
        for n_skips in (0, 1, 2):
            for rows in (2, 4, 8):
                configs.append((dt, isz, rows, n_skips))
    for dt, isz, rows, n_skips in configs:
        ok, real = probe(dt, rows, n_skips)
        print(json.dumps({
            "dtype": str(jnp.dtype(dt)), "rows": rows, "n_skips": n_skips,
            "ok": ok, "real_mb": real,
            "picked": _pick_rows(768, 256, 256, isz, n_skips),
        }), flush=True)


if __name__ == "__main__":
    main()
