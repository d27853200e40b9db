"""Independent ground truth: our torch mirror and JAX model vs the
HuggingFace `transformers` DepthPro implementation (a separate port of
Apple ml-depth-pro). Same random weights flow through all three; agreement
rules out a shared misunderstanding between the JAX model and the
self-authored mirror in tests/torch_ref.py (round-1 verdict's accuracy
concern). Production 24x24 token geometry is required for exact
equivalence (see scripts/parity_hf.py docstring)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def three_way():
    import torch

    import parity_hf
    import torch_ref

    cfg = parity_hf.parity_config()
    tm = torch_ref.randomize(torch_ref.DepthPro(cfg), seed=42).eval()
    sd = tm.state_dict()
    hf = parity_hf.hf_model(cfg)
    hf_sd = parity_hf.to_hf_state_dict(cfg, sd)
    missing, unexpected = hf.load_state_dict(hf_sd, strict=False)
    assert not unexpected
    assert all("mask_token" in k for k in missing)

    rng = np.random.RandomState(0)
    img = rng.rand(1, cfg.img_size, cfg.img_size, 3).astype(np.float32) * 2 - 1
    x = torch.from_numpy(img).permute(0, 3, 1, 2)
    with torch.no_grad():
        mirror = torch_ref.dump_stages(tm, x)
        out = hf(pixel_values=x)
    return cfg, sd, img, mirror, out


def test_mirror_matches_hf_exactly(three_way):
    """The torch mirror is the same network as HF's independent port:
    canonical inverse depth to float noise, fov bit-equal."""
    _cfg, _sd, _img, mirror, out = three_way
    np.testing.assert_allclose(
        mirror["canonical_inverse_depth"], out.predicted_depth.numpy(), atol=1e-5)
    np.testing.assert_array_equal(mirror["fov_deg"], out.field_of_view.numpy())


def test_jax_matches_hf(three_way):
    cfg, sd, img, _mirror, out = three_way
    import jax.numpy as jnp

    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models import fov as fov_mod
    from matrix_eyes_tpu.pt.convert import convert_state_dict

    flat = {k: v.numpy() for k, v in sd.items()}
    params = convert_state_dict(cfg, flat)
    canonical, lowres = depth_pro.canonical_inverse_depth(cfg, params, jnp.asarray(img))
    fov_deg = fov_mod.forward(cfg, params["fov"], jnp.asarray(img), lowres)

    want = out.predicted_depth.numpy()
    scale = np.abs(want).mean()
    assert np.abs(np.asarray(canonical, np.float32) - want).max() < 0.05 * scale
    assert np.abs(np.asarray(fov_deg, np.float32)
                  - out.field_of_view.numpy()).max() < 1e-3
