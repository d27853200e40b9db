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
