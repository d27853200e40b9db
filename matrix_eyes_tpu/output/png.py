"""PNG serialisation: striped native encoder fed by whole-plane readbacks.

The reference's metric ends at ``out_image.save`` (output.rs:141-193), so
PNG encoding is part of the user-visible cost. Two levers beat the
single-threaded reference encoder:

* the native striped encoder (native/pngwriter.cpp) compresses independent
  ENCODE_ROWS stripes on a worker pool -- multi-core scaling on
  production hosts; stripes are sliced from the HOST copy, so stripe
  boundaries (and the output bytes) never depend on how the image
  crossed the link;
* device->host transfers move whole planes (fewest link round trips --
  the one-shot forensic in docs/PERFORMANCE.md measured multi-second
  per-output costs on remote relays), started asynchronously up front.

Level/filter policy: stereograms use filter None + zlib level 1 -- their
pixel chains are long exact LZ matches (measured ratio 0.18 at level 1,
0.16 at level 6; level 1 is ~2x faster), and PNG row filters would only
obscure those matches. Depth maps are smooth gradients: fixed Up + level 1.
Measured on a 12 MP rendered gradient (single core): Up+1 encodes in
0.31 s at 5.4 MB where Paeth+6 takes 1.72 s for 3.8 MB -- 5x the speed for
~45% more bytes, and the e2e second is the product target (BASELINE), not
the file size. Paeth's per-pixel predictor is the cost; Up keeps most of
its ratio on vertical gradients at filter-None speed.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from matrix_eyes_tpu.errors import OutputError
from matrix_eyes_tpu.native import pngwriter

STEREOGRAM = {"level": 1, "filter": pngwriter.FILTER_NONE}
DEPTH_MAP = {"level": 1, "filter": pngwriter.FILTER_UP}

# Encode-stripe granularity for the native worker pool. Independent of the
# DEVICE->HOST transfer granularity (output/depthmap.transfer_band_rows):
# however coarse the transferred bands are, each is re-sliced into
# ENCODE_ROWS host stripes before enqueueing, so the pool's parallelism
# (and the byte-exact stripe boundaries the goldens pin) never depend on
# how the bytes crossed the link.
ENCODE_ROWS = 256


def _host_stripes(arr: np.ndarray):
    """Slice a host array into ENCODE_ROWS-row views (no copies)."""
    return [arr[i:i + ENCODE_ROWS] for i in range(0, arr.shape[0], ENCODE_ROWS)]


def save_device_bands(bands: Sequence, path: str, *, level: int = 1,
                      filter: int = pngwriter.FILTER_NONE) -> None:
    """Encode an image that lives on device as a sequence of row bands
    ((n_i, W, 3) u8 arrays, top to bottom) -- in the product paths, ONE
    whole-plane band (see output/depthmap.transfer_band_rows).

    All transfers are started asynchronously up front and materialised
    before encoding begins; each host copy is then re-sliced at
    ENCODE_ROWS and enqueued to the native worker pool, which compresses
    the stripes in parallel while later enqueues proceed.
    """
    h = sum(int(b.shape[0]) for b in bands)
    w = int(bands[0].shape[1])

    for b in bands:
        cth = getattr(b, "copy_to_host_async", None)
        if cth is not None:
            cth()

    if not pngwriter.available():
        _pil_save(np.concatenate([np.asarray(b) for b in bands], axis=0),
                  path, level)
        return
    from matrix_eyes_tpu import timings

    try:
        with timings.span("png: device->host"):
            host = [np.asarray(b) for b in bands]
        with timings.span("png: encode+write"), \
                pngwriter.PngEncoder(path, w, h, level=level,
                                     filter=filter) as enc:
            for b in host:
                for stripe in _host_stripes(b):
                    enc.write_rows(stripe)
    except OSError as e:
        raise OutputError(f"Image error: {e}") from e


def host_resize_supported() -> bool:
    """Whether the depth-map save can take the compact grid-transfer path
    (native striped encoder + native host Lanczos3 resizer)."""
    from matrix_eyes_tpu.native import lanczos

    return pngwriter.available() and lanczos.available()


def save_depthmap_host_resize(grid, path: str, out_h: int, out_w: int) -> None:
    """Encode a depth-map PNG from its GRID-resolution colour image (device
    array, u8 (H, W, 3)): transfer 3 B/px at grid size, Lanczos3-upsize to
    (out_h, out_w) on the host (native/lanczos.cpp, image-crate semantics),
    then stripe-encode. ~5x less device->host traffic than moving the
    source-size plane for a 12 MP photo; pixels match the device-resize
    path within 1 u8 count on <2e-5 of pixels (tests/test_lanczos_native.py).
    """
    from matrix_eyes_tpu import timings
    from matrix_eyes_tpu.native import lanczos

    cth = getattr(grid, "copy_to_host_async", None)
    if cth is not None:
        cth()
    try:
        with timings.span("png: device->host"):
            host = np.asarray(grid)
        with timings.span("png: host resize"):
            full = lanczos.resize_rgb8(host, out_h, out_w)
        with timings.span("png: encode+write"), \
                pngwriter.PngEncoder(path, out_w, out_h,
                                     **DEPTH_MAP) as enc:
            for stripe in _host_stripes(full):
                enc.write_rows(stripe)
    except OSError as e:
        raise OutputError(f"Image error: {e}") from e


def split_supported() -> bool:
    """Whether the compact (shift, noise) stereogram save path can run --
    it needs the native encoder (the linker-scan replay lives there)."""
    return pngwriter.available()


def save_stereogram_split(pairs, path: str, pattern_width: int, *,
                          level: int = 1) -> None:
    """Encode a stereogram from its compact device representation (see
    ops.stereogram.synthesize_stereogram_split): per band, shift (n, W) u8
    and noise (n, pw, 3) u8 -- in the product paths one whole-plane pair.
    Transfers are started asynchronously up front and materialised; the
    host copies are then re-sliced at ENCODE_ROWS and the native worker
    pool replays the reference linker scan and compresses the stripes in
    parallel."""
    h = sum(int(s.shape[0]) for s, _ in pairs)
    w = int(pairs[0][0].shape[1])

    for s, n in pairs:
        for b in (s, n):
            cth = getattr(b, "copy_to_host_async", None)
            if cth is not None:
                cth()

    from matrix_eyes_tpu import timings

    try:
        with timings.span("png: device->host"):
            host = [(np.asarray(s), np.asarray(n)) for s, n in pairs]
        with timings.span("png: encode+write"), \
                pngwriter.PngEncoder(path, w, h, level=level,
                                     filter=pngwriter.FILTER_NONE) as enc:
            for s, n in host:
                # lockstep host re-slicing (noise is per-row, rows align)
                for ss, ns in zip(_host_stripes(s), _host_stripes(n)):
                    enc.write_stereo_rows(ss, ns, pattern_width)
    except OSError as e:
        raise OutputError(f"Image error: {e}") from e


def _pil_save(rgb: np.ndarray, path: str, level: int) -> None:
    from PIL import Image

    try:
        Image.fromarray(rgb, mode="RGB").save(path, compress_level=level)
    except (OSError, ValueError) as e:
        raise OutputError(f"Image error: {e}") from e
