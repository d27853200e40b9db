"""Numerical parity: JAX implementation vs the PyTorch mirror (tests/torch_ref.py).

The accuracy contract is < 1% relative depth error vs PyTorch Depth Pro
(BASELINE.md targets); at f32 on identical random weights the two stacks
should agree to ~1e-4 relative, which these tests enforce per-stage and
end-to-end on the TINY config.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from matrix_eyes_tpu.config import TINY
from matrix_eyes_tpu.models import decoder as jdecoder
from matrix_eyes_tpu.models import depth_pro as jdepth_pro
from matrix_eyes_tpu.models import encoder as jencoder
from matrix_eyes_tpu.models import fov as jfov
from matrix_eyes_tpu.models import head as jhead
from matrix_eyes_tpu.models import vit as jvit
from matrix_eyes_tpu.pt.convert import convert_state_dict

import torch_ref


@pytest.fixture(scope="module")
def pair():
    cfg = TINY
    tmodel = torch_ref.randomize(torch_ref.DepthPro(cfg), seed=7).eval()
    flat = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_state_dict(cfg, flat)
    return cfg, tmodel, params


def _img(cfg, seed=0, batch=1):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=(batch, 3, cfg.img_size, cfg.img_size)).astype(np.float32)


def _to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _assert_close(jax_nhwc, torch_nchw, rtol=2e-4, atol=2e-5):
    a = np.asarray(jax_nhwc)
    b = torch_nchw.detach().numpy()
    if b.ndim == 4:
        b = np.transpose(b, (0, 2, 3, 1))
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


def test_vit_parity(pair):
    cfg, tmodel, params = pair
    x = _img(cfg, seed=1)[:, :, : cfg.vit_img_size, : cfg.vit_img_size]
    tout, tinters = tmodel.encoder.patch_encoder.forward_features(
        torch.from_numpy(x), cfg.highres_block_ids)
    jout, jinters = jvit.forward_features(
        cfg, params["encoder"]["patch_encoder"], _to_nhwc(x),
        intermediate_blocks=cfg.highres_block_ids)
    np.testing.assert_allclose(np.asarray(jout), tout.detach().numpy(), rtol=2e-4, atol=2e-5)
    for ji, ti in zip(jinters, tinters):
        np.testing.assert_allclose(np.asarray(ji), ti.detach().numpy(), rtol=2e-4, atol=2e-5)


def test_encoder_parity(pair):
    cfg, tmodel, params = pair
    x = _img(cfg, seed=2)
    tencs = tmodel.encoder(torch.from_numpy(x))
    jencs = jencoder.forward_encodings(cfg, params["encoder"], _to_nhwc(x))
    for je, te in zip(jencs, tencs):
        _assert_close(je, te)


def test_decoder_head_parity(pair):
    cfg, tmodel, params = pair
    with torch.no_grad():
        x = _img(cfg, seed=3)
        tencs = tmodel.encoder(torch.from_numpy(x))
        tfeat, tlow = tmodel.decoder(tencs)
        tcanon = tmodel.head(tfeat)
    jencs = jencoder.forward_encodings(cfg, params["encoder"], _to_nhwc(x))
    jfeat, jlow = jdecoder.forward(params["decoder"], jencs)
    _assert_close(jfeat, tfeat, rtol=5e-4, atol=5e-5)
    _assert_close(jlow, tlow, rtol=5e-4, atol=5e-5)
    jcanon = jhead.forward(params["head"], jfeat)
    _assert_close(jcanon, tcanon, rtol=5e-4, atol=5e-5)


def test_fov_parity(pair):
    cfg, tmodel, params = pair
    with torch.no_grad():
        x = _img(cfg, seed=4)
        tencs = tmodel.encoder(torch.from_numpy(x))
        _, tlow = tmodel.decoder(tencs)
        tdeg = tmodel.fov(torch.from_numpy(x), tlow)
    jencs = jencoder.forward_encodings(cfg, params["encoder"], _to_nhwc(x))
    _, jlow = jdecoder.forward(params["decoder"], jencs)
    jdeg = jfov.forward(cfg, params["fov"], _to_nhwc(x), jlow)
    np.testing.assert_allclose(np.asarray(jdeg), tdeg.numpy(), rtol=1e-3, atol=1e-4)


def test_end_to_end_parity(pair):
    cfg, tmodel, params = pair
    x = _img(cfg, seed=5)
    with torch.no_grad():
        tinv = tmodel(torch.from_numpy(x), f_norm=0.8)
    jinv = jdepth_pro.forward_with_fnorm(cfg, params, _to_nhwc(x), jnp.float32(0.8))
    np.testing.assert_allclose(np.asarray(jinv), tinv.numpy(), rtol=2e-3, atol=1e-4)


def test_end_to_end_fov_parity(pair):
    cfg, tmodel, params = pair
    x = _img(cfg, seed=6)
    with torch.no_grad():
        tinv = tmodel(torch.from_numpy(x), f_norm=None)
    jinv, _ = jdepth_pro.forward_with_fov(cfg, params, _to_nhwc(x))
    np.testing.assert_allclose(np.asarray(jinv), tinv.numpy(), rtol=5e-3, atol=2e-4)
