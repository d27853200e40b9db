"""Pipeline pieces: EXIF focal length, preprocessing, DepthMap rendering."""

import math

import numpy as np
from PIL import Image

import jax.numpy as jnp

from matrix_eyes_tpu.io.image import load_source_image
from matrix_eyes_tpu.output.depthmap import DepthMap
from matrix_eyes_tpu.pipeline import preprocess_image



def _save_jpeg_with_exif(path, img, focal_35mm=None, orientation=None):
    im = Image.fromarray(img)
    exif = Image.Exif()
    if orientation is not None:
        exif[0x0112] = orientation
    if focal_35mm is not None:
        exif[0xA405] = focal_35mm
    im.save(path, exif=exif, quality=95)


def test_exif_focal_length(tmp_path):
    img = np.random.RandomState(0).randint(0, 256, (30, 40, 3), np.uint8)
    p = str(tmp_path / "f.jpg")
    _save_jpeg_with_exif(p, img, focal_35mm=28)
    src = load_source_image(p)
    assert src.focal_length_35mm == 28.0
    # f_px = f35 * diag / diag35 (reconstruction.rs:145-152)
    diag = math.sqrt(40.0 ** 2 + 30.0 ** 2)
    diag35 = math.sqrt(24.0 ** 2 + 36.0 ** 2)
    assert abs(src.focal_length_px() - 28.0 * diag / diag35) < 1e-9
    assert abs(src.f_norm() - np.float32(src.focal_length_px() / 40.0)) < 1e-9


def test_explicit_focal_overrides_exif(tmp_path):
    img = np.zeros((10, 10, 3), np.uint8)
    p = str(tmp_path / "g.jpg")
    _save_jpeg_with_exif(p, img, focal_35mm=50)
    src = load_source_image(p, focal_length_35mm=35.0)
    assert src.focal_length_35mm == 35.0


def test_no_exif_gives_none(tmp_path):
    img = np.zeros((10, 10, 3), np.uint8)
    p = str(tmp_path / "h.png")
    Image.fromarray(img).save(p)
    src = load_source_image(p)
    assert src.focal_length_35mm is None
    assert src.f_norm() is None


def test_exif_orientation_applied(tmp_path):
    # orientation 6 = rotate 90 CW: a 40x30 image becomes 30x40
    img = np.random.RandomState(1).randint(0, 256, (30, 40, 3), np.uint8)
    p = str(tmp_path / "o.jpg")
    _save_jpeg_with_exif(p, img, orientation=6)
    src = load_source_image(p)
    assert src.original_size == (30, 40)  # (width, height) after rotation


def test_preprocess_range_and_shape():
    rng = np.random.RandomState(2)
    rgb = rng.randint(0, 256, (100, 160, 3), np.uint8)
    out = np.asarray(preprocess_image(jnp.asarray(rgb), 64, jnp.float32))
    assert out.shape == (1, 64, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # constant image maps exactly: v/255 normalised with mean=std=0.5
    flat = np.full((32, 32, 3), 200, np.uint8)
    out = np.asarray(preprocess_image(jnp.asarray(flat), 16, jnp.float32))
    np.testing.assert_allclose(out, (200 / 255.0 - 0.5) / 0.5, atol=1e-6)


def test_depthmap_clamps_to_clip_range():
    inv = jnp.asarray(np.array([[1e-4, 0.5], [500.0, 9.0]], np.float32))
    dm = DepthMap.new(inv, (2, 2))
    d = dm.to_numpy()
    assert d[0, 0] == np.float32(1.0 / 250.0)  # far clamp (output.rs:51)
    assert d[1, 0] == np.float32(10.0)  # near clamp
    assert d[0, 1] == np.float32(0.5)


def test_depthmap_render_shape_and_near_bright():
    rng = np.random.RandomState(3)
    inv = jnp.asarray(rng.uniform(0.01, 9.0, (32, 32)).astype(np.float32))
    dm = DepthMap.new(inv, (48, 40))
    img = dm.render_depth_map()
    assert img.shape == (40, 48, 3)
    # nearest point (max inverse depth) maps to value 0 = LUT[0] = bright
    # yellow; farthest to the dark end
    data = dm.to_numpy()
    iy, ix = np.unravel_index(np.argmax(data), data.shape)
    # sample the unresized colormap instead: recompute at grid res
    from matrix_eyes_tpu.ops.colormap import map_depth
    value = (data.max() - data) / (data.max() - data.min())
    rgb = np.asarray(map_depth(jnp.asarray(value)))
    assert tuple(rgb[iy, ix]) == (0xFD, 0xE7, 0x25)  # viridis bright end


def test_stereogram_render_resize_scale_rounding():
    inv = jnp.asarray(np.full((8, 8), 1.0, np.float32))
    dm = DepthMap.new(inv, (11, 7))
    out = dm.render_stereogram(1.5, 0.1, seed=0)
    # Rust rounds half away from zero: 11*1.5=16.5 -> 17 (not 16)
    assert out.shape == (11, 17, 3)  # 7*1.5=10.5 -> 11 rows


def test_grayscale_and_palette_inputs(tmp_path):
    from matrix_eyes_tpu.io.image import load_source_image
    from PIL import Image
    import numpy as np

    g = np.random.RandomState(5).randint(0, 256, (20, 30), np.uint8)
    p1 = str(tmp_path / "gray.png")
    Image.fromarray(g, mode="L").save(p1)
    src = load_source_image(p1)
    assert src.rgb.shape == (20, 30, 3)

    p2 = str(tmp_path / "pal.png")
    Image.fromarray(np.stack([g] * 3, -1)).convert("P").save(p2)
    src = load_source_image(p2)
    assert src.rgb.shape == (20, 30, 3)
