"""Checkpoint subsystem tests: torch-free .pt parsing + conversion + cache."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import TINY
from matrix_eyes_tpu.errors import CheckpointMissingKeys, LoaderError
from matrix_eyes_tpu.pt.convert import convert_state_dict
from matrix_eyes_tpu.pt.pickle_reader import read_pt_state_dict

import torch_ref


@pytest.fixture(scope="module")
def tmodel():
    return torch_ref.randomize(torch_ref.DepthPro(TINY), seed=11).eval()


def test_read_pt_roundtrip_f32(tmodel, tmp_path):
    path = str(tmp_path / "ckpt.pt")
    torch.save(tmodel.state_dict(), path)
    flat = read_pt_state_dict(path)
    sd = tmodel.state_dict()
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(flat[k], sd[k].numpy())


def test_read_pt_half_precision(tmodel, tmp_path):
    # The real depth_pro.pt stores f16 (README.md:64-69: ~1.9 GB for 0.95B
    # params); verify HalfStorage parsing.
    path = str(tmp_path / "ckpt_f16.pt")
    sd16 = {k: v.half() for k, v in tmodel.state_dict().items()}
    torch.save(sd16, path)
    flat = read_pt_state_dict(path)
    for k in sd16:
        assert flat[k].dtype == np.float16
        np.testing.assert_array_equal(flat[k], sd16[k].numpy())


def test_read_pt_wrapped_state_dict(tmodel, tmp_path):
    path = str(tmp_path / "wrapped.pt")
    torch.save({"state_dict": tmodel.state_dict(), "step": 7}, path)
    flat = read_pt_state_dict(path)
    assert "encoder.patch_encoder.cls_token" in flat


def test_read_pt_rejects_non_zip(tmp_path):
    path = str(tmp_path / "junk.pt")
    with open(path, "wb") as f:
        f.write(b"not a checkpoint")
    with pytest.raises(LoaderError):
        read_pt_state_dict(path)


def test_convert_from_pt_file_matches_direct(tmodel, tmp_path):
    path = str(tmp_path / "ckpt.pt")
    torch.save(tmodel.state_dict(), path)
    flat = read_pt_state_dict(path)
    params = convert_state_dict(TINY, flat)
    direct = convert_state_dict(TINY, {k: v.numpy() for k, v in tmodel.state_dict().items()})
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_missing_keys_listed(tmodel):
    flat = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    del flat["head.0.weight"]
    del flat["decoder.fusions.2.out_conv.bias"]
    with pytest.raises(CheckpointMissingKeys) as e:
        convert_state_dict(TINY, flat)
    missing = e.value.missing
    assert "head.0.weight" in missing
    assert "decoder.fusions.2.out_conv.bias" in missing


def test_convert_ignores_extra_keys(tmodel):
    # The real checkpoint carries extras (e.g. DINOv2 mask_token); like the
    # reference (unused snapshots are not an error), they are ignored.
    flat = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    flat["encoder.patch_encoder.mask_token"] = np.zeros((1, 16), np.float32)
    convert_state_dict(TINY, flat)


def test_convert_dtype_cast(tmodel):
    flat = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_state_dict(TINY, flat, dtype=jnp.bfloat16)
    assert all(leaf.dtype == jnp.bfloat16 for leaf in jax.tree.leaves(params))


def test_convert_parts_subset(tmodel):
    flat = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_state_dict(TINY, flat, parts=("encoder", "decoder", "head"))
    assert "fov" not in params


def test_convert_compact_index_fallbacks(tmodel):
    """A hole-free (compact) Sequential naming convention (e.g. a
    re-exported checkpoint) loads via the converter's fallback indices and
    produces identical parameters."""
    import re

    flat = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    renames = {}
    for k in list(flat):
        nk = k
        nk = re.sub(r"(resnet[12])\.residual\.1\.", r"\1.residual.0.", nk)
        nk = re.sub(r"(resnet[12])\.residual\.3\.", r"\1.residual.1.", nk)
        nk = re.sub(r"^head\.4\.", "head.3.", nk)
        nk = re.sub(r"^fov\.head\.2\.", "fov.head.1.", nk)
        nk = re.sub(r"^fov\.head\.4\.", "fov.head.2.", nk)
        m = re.match(r"^decoder\.convs\.(\d)\.", nk)
        if m:
            nk = f"decoder.convs.{int(m.group(1)) - 1}." + nk.split(".", 3)[3]
        renames[k] = nk
    compact = {renames[k]: v for k, v in flat.items()}
    import jax

    a = convert_state_dict(TINY, flat)
    b = convert_state_dict(TINY, compact)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
