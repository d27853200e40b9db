"""Native striped PNG encoder: round-trip correctness vs PIL decode, the
streaming band API, and the banded device-output paths in DepthMap."""

import numpy as np
import pytest

import jax.numpy as jnp

from matrix_eyes_tpu.native import pngwriter as pw

pytestmark = pytest.mark.skipif(not pw.available(),
                                reason="native PNG encoder unavailable")


def _decode(path):
    from PIL import Image

    with Image.open(path) as im:
        assert im.mode == "RGB"
        return np.asarray(im)


@pytest.mark.parametrize("filt", [pw.FILTER_NONE, pw.FILTER_SUB, pw.FILTER_UP,
                                  pw.FILTER_AVERAGE, pw.FILTER_PAETH])
def test_round_trip_all_filters(tmp_path, filt):
    rng = np.random.RandomState(filt)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    p = str(tmp_path / f"f{filt}.png")
    assert pw.encode(img, p, level=1, filter=filt, stripe_rows=10)
    np.testing.assert_array_equal(_decode(p), img)


def test_round_trip_multi_stripe_levels(tmp_path):
    rng = np.random.RandomState(0)
    for level in (0, 1, 6, 9):
        img = rng.randint(0, 256, (130, 257, 3), np.uint8)
        p = str(tmp_path / f"l{level}.png")
        assert pw.encode(img, p, level=level, filter=pw.FILTER_PAETH,
                         stripe_rows=17)
        np.testing.assert_array_equal(_decode(p), img)


def test_streaming_bands(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (301, 211, 3), np.uint8)
    p = str(tmp_path / "stream.png")
    with pw.PngEncoder(p, 211, 301, level=1, filter=pw.FILTER_UP) as enc:
        for y in range(0, 301, 64):
            enc.write_rows(img[y:y + 64])
    np.testing.assert_array_equal(_decode(p), img)


def test_streaming_row_overflow_fails(tmp_path):
    img = np.zeros((8, 8, 3), np.uint8)
    p = str(tmp_path / "overflow.png")
    enc = pw.PngEncoder(p, 8, 4, level=1)
    with pytest.raises(OSError):
        enc.write_rows(img)  # 8 rows into a 4-row image


def test_save_device_bands_matches_full(tmp_path):
    from matrix_eyes_tpu.output import png

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (97, 41, 3), np.uint8)
    bands = [jnp.asarray(img[lo:lo + 25]) for lo in range(0, 97, 25)]
    p = str(tmp_path / "bands.png")
    png.save_device_bands(bands, p, **png.STEREOGRAM)
    np.testing.assert_array_equal(_decode(p), img)


def test_depthmap_banded_png_matches_array_path(tmp_path):
    """output_image .png routes through the banded native encoder; the file
    must decode to exactly the array the render methods produce."""
    from matrix_eyes_tpu.output.depthmap import DepthMap, ImageOutputFormat

    rng = np.random.RandomState(3)
    inv = jnp.asarray(rng.uniform(1 / 250, 1 / 0.1, (32, 32)).astype(np.float32))
    dm = DepthMap.new(inv, original_size=(60, 48))

    p1 = str(tmp_path / "depth.png")
    dm.output_image(p1, source_path="", image_format=ImageOutputFormat.DEPTH_MAP)
    # upsizing + native resizer available -> the host-resize path wrote the
    # file; its pixels are render_depth_map_host's (device-path equivalence
    # itself is pinned in tests/test_lanczos_native.py)
    from matrix_eyes_tpu.output import png as _png

    want = (dm.render_depth_map_host() if _png.host_resize_supported()
            else dm.render_depth_map())
    np.testing.assert_array_equal(_decode(p1), want)

    p2 = str(tmp_path / "stereo.png")
    dm.output_image(p2, source_path="",
                    image_format=ImageOutputFormat.STEREOGRAM, seed=7)
    np.testing.assert_array_equal(
        _decode(p2), dm.render_stereogram(None, 1.0 / 16.0, seed=7))


def test_stereo_split_png_identical_to_full_render(tmp_path):
    """The compact (shift, noise) save path must produce a PNG whose pixels
    are exactly the device-resolved stereogram."""
    from matrix_eyes_tpu.ops.stereogram import (
        synthesize_stereogram,
        synthesize_stereogram_split,
    )
    from matrix_eyes_tpu.output import png

    rng = np.random.RandomState(9)
    depth = jnp.asarray(rng.uniform(1 / 250, 1 / 0.1, (32, 48)).astype(np.float32))
    for oh, ow, amp in [(64, 96, 1 / 16.0), (50, 77, 0.05), (40, 2100, 0.1)]:
        full = np.asarray(synthesize_stereogram(depth, oh, ow, amp, seed=5))
        split = synthesize_stereogram_split(depth, oh, ow, amp, seed=5,
                                            band_rows=16)
        assert split is not None, (oh, ow, amp)
        pw, pairs = split
        p = str(tmp_path / f"split_{ow}.png")
        png.save_stereogram_split(pairs, p, pw)
        np.testing.assert_array_equal(_decode(p), full)


def test_stereo_split_with_noise_prefetch(tmp_path):
    """Prefetched noise (dispatched before the forward in the pipeline)
    must be consumed as-is when its geometry matches -- same PNG bytes as
    the non-prefetched path -- and silently regenerated when it doesn't."""
    from matrix_eyes_tpu.ops.stereogram import (
        prefetch_stereogram_noise,
        synthesize_stereogram,
        synthesize_stereogram_split,
    )
    from matrix_eyes_tpu.output import png

    rng = np.random.RandomState(10)
    depth = jnp.asarray(rng.uniform(1 / 250, 1 / 0.1, (32, 48)).astype(np.float32))
    oh, ow, amp = 64, 96, 1 / 16.0
    full = np.asarray(synthesize_stereogram(depth, oh, ow, amp, seed=5))

    noise = prefetch_stereogram_noise(oh, ow, amp, seed=5, band_rows=16)
    assert noise is not None
    pw, pairs = synthesize_stereogram_split(depth, oh, ow, amp, seed=5,
                                            band_rows=16, noise=noise)
    # the prefetch's own band objects must be what gets encoded
    assert all(n is pn for (_, n), pn in zip(pairs, noise.bands))
    p = str(tmp_path / "prefetched.png")
    png.save_stereogram_split(pairs, p, pw)
    np.testing.assert_array_equal(_decode(p), full)

    # wrong seed / wrong geometry -> the stale prefetch is ignored
    stale = prefetch_stereogram_noise(oh, ow, amp, seed=6, band_rows=16)
    pw2, pairs2 = synthesize_stereogram_split(depth, oh, ow, amp, seed=5,
                                              band_rows=16, noise=stale)
    assert all(n is not sn for (_, n), sn in zip(pairs2, stale.bands))
    p2 = str(tmp_path / "stale_ignored.png")
    png.save_stereogram_split(pairs2, p2, pw2)
    np.testing.assert_array_equal(_decode(p2), full)

    # prefetch refuses geometries where the compact form doesn't apply
    assert prefetch_stereogram_noise(16, 16, 0.0) is None


def test_stereo_split_fallbacks():
    from matrix_eyes_tpu.ops.stereogram import synthesize_stereogram_split

    depth = jnp.ones((8, 8), jnp.float32)
    # pw == 0 (degenerate amplitude)
    assert synthesize_stereogram_split(depth, 16, 16, 0.0) is None
    # wide self-link case: dm ~ 0.5 makes max_shift == pw
    assert synthesize_stereogram_split(depth, 16, 16, 0.5 / 16.0) is None
    # shifts over 255 don't fit u8
    assert synthesize_stereogram_split(depth, 16, 4096, 0.25) is None


def test_stereogram_bands_equal_full_image():
    from matrix_eyes_tpu.ops.stereogram import (
        synthesize_stereogram,
        synthesize_stereogram_bands,
    )

    rng = np.random.RandomState(4)
    depth = jnp.asarray(rng.uniform(1 / 250, 1 / 0.1, (24, 24)).astype(np.float32))
    full = np.asarray(synthesize_stereogram(depth, 50, 70, 1 / 16.0, seed=3))
    bands = synthesize_stereogram_bands(depth, 50, 70, 1 / 16.0, seed=3,
                                        band_rows=16)
    assert [int(b.shape[0]) for b in bands] == [16, 16, 16, 2]
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b) for b in bands], axis=0), full)


def test_pil_fallback_when_native_unavailable(tmp_path, monkeypatch):
    from matrix_eyes_tpu.output import png

    monkeypatch.setattr(png.pngwriter, "available", lambda: False)
    assert not png.split_supported()
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (30, 20, 3), np.uint8)
    bands = [jnp.asarray(img[:17]), jnp.asarray(img[17:])]
    p = str(tmp_path / "fallback.png")
    png.save_device_bands(bands, p, **png.STEREOGRAM)
    np.testing.assert_array_equal(_decode(p), img)


def test_write_rows_width_mismatch_rejected(tmp_path):
    # the C side only counts rows; a wrong width would over-read the buffer
    rng = np.random.RandomState(7)
    p = str(tmp_path / "w.png")
    with pw.PngEncoder(p, 16, 8, level=1) as enc:
        with pytest.raises(ValueError, match="expects"):
            enc.write_rows(rng.randint(0, 256, (4, 8, 3), np.uint8))
        enc.write_rows(rng.randint(0, 256, (8, 16, 3), np.uint8))


def test_write_stereo_rows_shape_mismatch_rejected(tmp_path):
    p = str(tmp_path / "s.png")
    shift = np.zeros((4, 16), np.uint8)
    noise = np.zeros((4, 5, 3), np.uint8)
    with pw.PngEncoder(p, 16, 8, level=1) as enc:
        with pytest.raises(ValueError, match="shift"):
            enc.write_stereo_rows(np.zeros((4, 8), np.uint8), noise, 5)
        with pytest.raises(ValueError, match="noise"):
            enc.write_stereo_rows(shift, np.zeros((4, 6, 3), np.uint8), 5)
        enc.write_stereo_rows(shift, noise, 5)
        enc.write_stereo_rows(shift, noise, 5)


def test_jpeg_output_routes_through_pil(tmp_path):
    """Non-PNG image destinations (the reference saves whatever extension the
    image crate knows, output.rs:100-121) fall through to the PIL save path;
    a .jpg must decode as a real JPEG at the right size for both formats."""
    from PIL import Image

    from matrix_eyes_tpu.output.depthmap import DepthMap, ImageOutputFormat

    # smooth ramp, not noise: JPEG error on noise would swamp the check
    ramp = np.linspace(1 / 250, 1 / 0.1, 32 * 32, dtype=np.float32)
    inv = jnp.asarray(ramp.reshape(32, 32))
    dm = DepthMap.new(inv, original_size=(60, 48))

    p1 = str(tmp_path / "depth.jpg")
    dm.output_image(p1, source_path="", image_format=ImageOutputFormat.DEPTH_MAP)
    with Image.open(p1) as im:
        assert im.format == "JPEG" and im.size == (60, 48)
        # JPEG is lossy: check the image is close to the exact render
        got = np.asarray(im.convert("RGB")).astype(np.int16)
    want = dm.render_depth_map().astype(np.int16)
    assert np.mean(np.abs(got - want)) < 8.0

    p2 = str(tmp_path / "stereo.jpg")
    dm.output_image(p2, source_path="",
                    image_format=ImageOutputFormat.STEREOGRAM, seed=7)
    with Image.open(p2) as im:
        assert im.format == "JPEG" and im.size == (60, 48)


def test_whole_plane_transfer_matches_banded_bytes(tmp_path):
    """The save paths transfer ONE buffer per plane (per-output first-fetch
    round trips dominate one-shot runs over remote links); the PNG bytes
    must be identical to a fine-banded device transfer -- host re-slicing
    keeps the encoder's stripe boundaries fixed at ENCODE_ROWS."""
    from matrix_eyes_tpu.ops.stereogram import (
        synthesize_stereogram_bands,
        synthesize_stereogram_split,
    )
    from matrix_eyes_tpu.output import png
    from matrix_eyes_tpu.output.depthmap import DepthMap, ImageOutputFormat

    rng = np.random.RandomState(4)
    inv = jnp.asarray(rng.uniform(1 / 250, 1 / 0.1, (64, 64)).astype(np.float32))
    # > 2*ENCODE_ROWS output rows so the re-slicing is non-trivial
    dm = DepthMap.new(inv, original_size=(70, 600))

    # pipeline save (whole-plane transfers)
    s1 = str(tmp_path / "s_plane.png")
    dm.output_image(s1, source_path="",
                    image_format=ImageOutputFormat.STEREOGRAM, seed=3)
    # explicit ENCODE_ROWS device banding through the same encoders (the
    # deflate stripes are independent streams, so byte identity requires
    # the SAME stripe boundaries -- whole-plane transfers re-slice at
    # ENCODE_ROWS, so a device banding at ENCODE_ROWS must match exactly)
    pw, pairs = synthesize_stereogram_split(dm.data, 600, 70, 1 / 16.0,
                                            seed=3, band_rows=png.ENCODE_ROWS)
    s2 = str(tmp_path / "s_banded.png")
    png.save_stereogram_split(pairs, s2, pw, level=png.STEREOGRAM["level"])
    assert open(s1, "rb").read() == open(s2, "rb").read()

    r1 = str(tmp_path / "r_plane.png")
    png.save_device_bands(
        synthesize_stereogram_bands(dm.data, 600, 70, 1 / 16.0, seed=3,
                                    band_rows=600), r1, **png.STEREOGRAM)
    r2 = str(tmp_path / "r_banded.png")
    png.save_device_bands(
        synthesize_stereogram_bands(dm.data, 600, 70, 1 / 16.0, seed=3,
                                    band_rows=png.ENCODE_ROWS),
        r2, **png.STEREOGRAM)
    assert open(r1, "rb").read() == open(r2, "rb").read()
