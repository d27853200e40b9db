"""Library API tests on the tiny checkpoint."""

import numpy as np
import pytest
import torch
from PIL import Image

from matrix_eyes_tpu.api import MatrixEyes
from matrix_eyes_tpu.config import TINY

import torch_ref


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("api")
    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=13)
    ckpt = str(d / "tiny.pt")
    torch.save(tm.state_dict(), ckpt)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(33, 50, 3), dtype=np.uint8)
    src = str(d / "s.png")
    Image.fromarray(img).save(src)
    return d, ckpt, src, img


def test_api_inverse_depth(env):
    d, ckpt, src, img = env
    me = MatrixEyes(ckpt)
    inv = me.inverse_depth(src, focal_length_35mm=35.0)
    assert inv.shape == (me.cfg.img_size, me.cfg.img_size)
    assert np.all(inv >= 1.0 / 250.0) and np.all(inv <= 10.0)


def test_api_accepts_arrays(env):
    d, ckpt, src, img = env
    me = MatrixEyes(ckpt)
    inv = me.inverse_depth(img, focal_length_35mm=35.0)
    # decoding the PNG round-trips the exact pixels, so results must match
    inv2 = me.inverse_depth(src, focal_length_35mm=35.0)
    np.testing.assert_array_equal(inv, inv2)


def test_api_process_outputs(env):
    d, ckpt, src, img = env
    me = MatrixEyes(ckpt)
    me.process(src, str(d / "o1.png"), focal_length_35mm=35.0)
    me.process(src, str(d / "o2.png"), focal_length_35mm=35.0,
               image_format="stereogram", resize_scale=2.0)
    me.process(src, str(d / "o3.obj"), focal_length_35mm=35.0, vertex_mode="plain")
    with Image.open(str(d / "o1.png")) as im:
        assert im.size == (50, 33)
    with Image.open(str(d / "o2.png")) as im:
        assert im.size == (100, 66)
    assert (d / "o3.obj").exists()


def test_api_fov_path(env):
    d, ckpt, src, img = env
    me = MatrixEyes(ckpt)
    inv = me.inverse_depth(src)  # no focal -> FOV head
    assert np.isfinite(inv).all()


def test_api_batch_matches_single(env):
    """inverse_depth_batch == per-image single calls, for every focal-length
    mode: all-known (fnorm path), mixed (FOV fills gaps), all-unknown."""
    d, ckpt, src, img = env
    me = MatrixEyes(ckpt)
    rng = np.random.RandomState(2)
    img2 = rng.randint(0, 256, size=(21, 40, 3), dtype=np.uint8)

    # all known focal lengths
    # tolerances: the batched program is a DIFFERENT XLA executable than
    # the single-image one (batch-dependent tiling reorders f32 sums), so
    # bit equality is not expected; 5e-3 absolute covers the reorder noise
    # at the inverse-depth clamp floor (1/250)
    tol = dict(rtol=2e-4, atol=5e-3)
    batch = me.inverse_depth_batch([img, img2], focal_length_35mm=35.0)
    assert batch.shape == (2, me.cfg.img_size, me.cfg.img_size)
    np.testing.assert_allclose(
        batch[0], me.inverse_depth(img, focal_length_35mm=35.0), **tol)
    np.testing.assert_allclose(
        batch[1], me.inverse_depth(img2, focal_length_35mm=35.0), **tol)

    # mixed: second image falls back to the FOV head, per-image semantics
    mixed = me.inverse_depth_batch([img, img2], focal_length_35mm=[35.0, None])
    np.testing.assert_allclose(
        mixed[0], me.inverse_depth(img, focal_length_35mm=35.0), **tol)
    np.testing.assert_allclose(mixed[1], me.inverse_depth(img2), **tol)

    # empty batch is well-defined
    assert me.inverse_depth_batch([]).shape == (0, me.cfg.img_size,
                                                me.cfg.img_size)

    with pytest.raises(ValueError):
        me.inverse_depth_batch([img], focal_length_35mm=[35.0, 28.0])


def test_api_batch_on_mesh(env):
    """The mesh parameter shards the batch (data axis) and the ViT blocks
    (model axis); results must match the unsharded batch."""
    d, ckpt, src, img = env
    from matrix_eyes_tpu.parallel.sharding import make_mesh

    me = MatrixEyes(ckpt)
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, size=(24, 36, 3), dtype=np.uint8)
            for _ in range(4)]
    want = me.inverse_depth_batch(imgs, focal_length_35mm=30.0)
    mesh = make_mesh(8, model=2)
    got = me.inverse_depth_batch(imgs, focal_length_35mm=30.0, mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)
    # sharded parameters are cached per mesh
    assert mesh in me._sharded_params
    got2 = me.inverse_depth_batch(imgs, focal_length_35mm=30.0, mesh=mesh)
    np.testing.assert_array_equal(got, got2)


def test_api_focal_override_on_preloaded_source(env):
    """An explicit focal_length_35mm must win even when the caller passes an
    already-loaded SourceImage (regression: _load returned it unchanged,
    silently dropping the override and routing through the FOV head)."""
    d, ckpt, src, img = env
    from matrix_eyes_tpu.io.image import SourceImage

    me = MatrixEyes(ckpt)
    rgb = np.asarray(img, dtype=np.uint8)
    pre = SourceImage(rgb=rgb, original_size=(rgb.shape[1], rgb.shape[0]),
                      focal_length_35mm=None)
    want = me.inverse_depth(rgb, focal_length_35mm=30.0)
    got = me.inverse_depth(pre, focal_length_35mm=30.0)
    np.testing.assert_array_equal(got, want)
    # and without an override the pre-loaded source's own focal is kept
    pre2 = SourceImage(rgb=rgb, original_size=(rgb.shape[1], rgb.shape[0]),
                       focal_length_35mm=30.0)
    np.testing.assert_array_equal(me.inverse_depth(pre2), want)


def test_api_process_batch(env, tmp_path):
    """process_batch writes the same files as per-image process() calls
    (one forward per batch_size images; padding on the short final chunk)."""
    d, ckpt, src, img = env
    me = MatrixEyes(ckpt)
    rng = np.random.RandomState(3)
    srcs = [src]
    for i in range(2):
        p = str(tmp_path / f"s{i}.png")
        Image.fromarray(rng.randint(0, 256, (30 + i, 44, 3), np.uint8)).save(p)
        srcs.append(p)
    singles = [str(tmp_path / f"one{i}.png") for i in range(3)]
    for s, o in zip(srcs, singles):
        me.process(s, o, focal_length_35mm=35.0, image_format="stereogram")
    batched = [str(tmp_path / f"bat{i}.png") for i in range(3)]
    me.process_batch(list(zip(srcs, batched)), batch_size=2,
                     focal_length_35mm=35.0, image_format="stereogram")
    for i, (a, b) in enumerate(zip(singles, batched)):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), f"output {i} differs"


def test_api_process_batch_on_mesh(env, tmp_path):
    d, ckpt, src, img = env
    from matrix_eyes_tpu.parallel import make_mesh

    me = MatrixEyes(ckpt)
    mesh = make_mesh(4, model=2)
    plain = [str(tmp_path / f"pb_plain{i}.png") for i in range(2)]
    mesh_out = [str(tmp_path / f"pb_mesh{i}.png") for i in range(2)]
    me.process_batch([(src, o) for o in plain], batch_size=2,
                     focal_length_35mm=35.0)
    me.process_batch([(src, o) for o in mesh_out], batch_size=2,
                     focal_length_35mm=35.0, mesh=mesh)
    for a, b in zip(plain, mesh_out):
        pa = np.asarray(Image.open(a)).astype(np.int16)
        pb = np.asarray(Image.open(b)).astype(np.int16)
        assert np.abs(pa - pb).max() <= 1
