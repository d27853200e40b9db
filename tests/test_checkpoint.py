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


def _compact_rename(flat):
    import re

    out = {}
    for k, v in flat.items():
        nk = k
        nk = re.sub(r"(resnet[12])\.residual\.1\.", r"\1.residual.0.", nk)
        nk = re.sub(r"(resnet[12])\.residual\.3\.", r"\1.residual.1.", nk)
        nk = re.sub(r"^head\.4\.", "head.3.", nk)
        nk = re.sub(r"^fov\.head\.2\.", "fov.head.1.", nk)
        nk = re.sub(r"^fov\.head\.4\.", "fov.head.2.", nk)
        m = re.match(r"^decoder\.convs\.(\d)\.", nk)
        if m:
            nk = f"decoder.convs.{int(m.group(1)) - 1}." + nk.split(".", 3)[3]
        out[nk] = v
    return out


def test_infer_config_compact_checkpoint(tmodel):
    """infer_config must accept the compact (hole-free) Sequential naming
    that convert_state_dict already supports -- head.4 falls back to head.3."""
    from matrix_eyes_tpu.pt.convert import infer_config

    flat = _compact_rename({k: v.numpy() for k, v in tmodel.state_dict().items()})
    cfg = infer_config(flat)
    assert cfg.head_last_dims == TINY.head_last_dims
    assert cfg.embed_dim == TINY.embed_dim


def _write_evil_pt(path, args, storage_bytes=16):
    """Craft a torch-zip checkpoint whose pickle feeds attacker-controlled
    (offset, size, stride) into _rebuild_tensor_v2. Uses the real torch
    globals so the pickle stream is exactly what torch.save would emit."""
    import io
    import pickle
    import zipfile

    class Ref:
        pass

    class EvilTensor:
        def __reduce__(self):
            return (torch._utils._rebuild_tensor_v2, (Ref(),) + args)

    class P(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, Ref):
                return ("storage", torch.FloatStorage, "0", "cpu", storage_bytes // 4)
            return None

    buf = io.BytesIO()
    P(buf, protocol=2).dump({"w": EvilTensor()})
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", b"\x00" * storage_bytes)
        zf.writestr("archive/version", "3")


@pytest.mark.parametrize(
    "args",
    [
        (0, (1000,), (1,)),           # size exceeds storage
        (3, (2,), (1,)),              # offset pushes past the end
        (0, (2, 2), (100, 1)),        # stride escapes the buffer
        (-1, (2,), (1,)),             # negative offset
        (0, (2,), (-1,)),             # negative stride
        (10, (), ()),                 # scalar offset out of bounds
    ],
)
def test_malicious_tensor_metadata_rejected(tmp_path, args):
    """Untrusted (offset, size, stride) must never reach as_strided: a
    malformed checkpoint raises LoaderError instead of reading out of
    bounds of the storage buffer (ADVICE.md, pickle_reader hardening)."""
    path = str(tmp_path / "evil.pt")
    _write_evil_pt(path, args)
    with pytest.raises(LoaderError):
        read_pt_state_dict(path)


def test_inbounds_strided_tensor_accepted(tmp_path):
    path = str(tmp_path / "ok.pt")
    _write_evil_pt(path, (0, (2, 2), (2, 1)), storage_bytes=16)
    flat = read_pt_state_dict(path)
    assert flat["w"].shape == (2, 2)


def test_truncated_storage_rejected(tmp_path):
    """Storage member shorter than numel*itemsize -> LoaderError, not a
    numpy ValueError crash."""
    import io
    import pickle
    import zipfile

    class Ref:
        pass

    class EvilTensor:
        def __reduce__(self):
            return (torch._utils._rebuild_tensor_v2, (Ref(), 0, (4,), (1,)))

    class P(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, Ref):
                return ("storage", torch.FloatStorage, "0", "cpu", 4)  # claims 4 floats
            return None

    buf = io.BytesIO()
    P(buf, protocol=2).dump({"w": EvilTensor()})
    path = str(tmp_path / "trunc.pt")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", b"\x00" * 8)  # only 2 floats on disk
        zf.writestr("archive/version", "3")
    with pytest.raises(LoaderError, match="truncated"):
        read_pt_state_dict(path)
