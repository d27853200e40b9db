"""Mixed weight precision (--dtype mixed, ops/mixed.py).

The round-4 weight-group attribution (docs/PARITY_RESULTS.md) measured
that the bf16 weight-rounding tail lives in the ~88 MiB of non-matmul
weights while the 1.7 GiB of ViT block matmuls cost p99 0.16 %. The mixed
policy keeps only those matmul weights bf16; these tests pin the policy
map, the loader layout (exact-dtype .mixed.npz cache, derived only from
the .pt), the input-driven dtype flow through the model, and that the
mode's accuracy sits far closer to f32 than all-bf16 does.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import TINY, RuntimeConfig, parse_dtype_policy
from matrix_eyes_tpu.models import depth_pro
from matrix_eyes_tpu.models.init import init_params
from matrix_eyes_tpu.ops.mixed import MIXED_BF16_KEYS, cast_params_mixed

import torch_ref


def test_parse_policy():
    assert parse_dtype_policy("mixed") == (jnp.bfloat16, False, True)
    assert parse_dtype_policy("int8") == (jnp.bfloat16, True, False)
    assert parse_dtype_policy("bf16") == (jnp.bfloat16, False, False)


def test_runtime_config_validation():
    rt = RuntimeConfig(mixed_bf16=True)
    assert rt.resolved_dtype() == jnp.bfloat16
    assert rt.image_dtype() == jnp.float32
    assert RuntimeConfig().image_dtype() == RuntimeConfig().resolved_dtype()
    with pytest.raises(ValueError):
        RuntimeConfig(mixed_bf16=True, quantize_int8=True)
    with pytest.raises(ValueError):
        RuntimeConfig(mixed_bf16=True, dtype=jnp.float32)


def test_cast_params_mixed_dtype_map():
    params = init_params(TINY, seed=3)
    mixed = cast_params_mixed(params)

    def keys_of(path):
        return [getattr(k, "key", None) for k in path]

    n_bf16 = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(mixed)[0]:
        keys = keys_of(path)
        if "blocks" in keys and keys[-1] in MIXED_BF16_KEYS:
            assert leaf.dtype == jnp.bfloat16, path
            n_bf16 += 1
        else:
            assert leaf.dtype == jnp.float32, path
    # 3 ViTs x 4 matmul weights each
    assert n_bf16 == 12


def test_mixed_forward_far_closer_to_f32_than_bf16():
    """The policy's point: with the image f32 and only block matmul weights
    bf16, the output should sit an order of magnitude closer to the f32
    pipeline than the all-bf16 pipeline does."""
    params = init_params(TINY, seed=7)
    rng = np.random.RandomState(0)
    img32 = jnp.asarray(
        rng.uniform(-1, 1, (1, TINY.img_size, TINY.img_size, 3))
        .astype(np.float32))

    # known focal (forward_with_fnorm): isolates the depth path -- the
    # random fixture's degenerate FOV estimate (~0.2 deg -> 1/f_norm ~500x)
    # would amplify ANY fov-scalar jitter into the comparison otherwise
    fn = jnp.float32(1.2)
    inv32 = depth_pro.forward_with_fnorm(TINY, params, img32, fn, False)
    cast16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    inv16 = depth_pro.forward_with_fnorm(
        TINY, cast16, img32.astype(jnp.bfloat16), fn, False)
    invm = depth_pro.forward_with_fnorm(
        TINY, cast_params_mixed(params), img32, fn, False)

    assert invm.dtype == inv32.dtype  # f32 out: input-driven dtype flow

    def err(a):
        return float(np.mean(np.abs(np.asarray(a, np.float64)
                                    - np.asarray(inv32, np.float64))))

    e16, em = err(inv16), err(invm)
    assert em < e16 / 5, f"mixed {em} not << bf16 {e16}"


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("mixed")
    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=11)
    path = str(d / "m.pt")
    torch.save(tm.state_dict(), path)
    return path


def test_loader_mixed_layout_and_cache(ckpt):
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    cfg, pm = load_checkpoint(ckpt, dtype=jnp.bfloat16, mixed_bf16=True,
                              convert_checkpoints=True)
    stem = os.path.splitext(ckpt)[0]
    assert os.path.exists(f"{stem}-encoder.mixed.npz")

    # protected leaves carry the checkpoint's OWN f32 values (no f16/bf16
    # cache round trip), bf16 leaves are exactly bf16(x)
    _, src = load_checkpoint(ckpt, dtype=jnp.float32, use_caches=False)
    flat_m = jax.tree_util.tree_flatten_with_path(pm)[0]
    flat_s = jax.tree.leaves(src)
    assert len(flat_m) == len(flat_s)
    for (path, a), s in zip(flat_m, flat_s):
        keys = [getattr(k, "key", None) for k in path]
        if "blocks" in keys and keys[-1] in MIXED_BF16_KEYS:
            assert a.dtype == jnp.bfloat16
            np.testing.assert_array_equal(
                np.asarray(a, np.float32),
                np.asarray(s.astype(jnp.bfloat16), np.float32), err_msg=str(path))
        else:
            assert a.dtype == jnp.float32, path
            np.testing.assert_array_equal(np.asarray(a), np.asarray(s),
                                          err_msg=str(path))

    # warm load reads the .mixed.npz and is byte-identical to the cold one
    _, pw = load_checkpoint(ckpt, dtype=jnp.bfloat16, mixed_bf16=True)
    for a, b in zip(jax.tree.leaves(pm), jax.tree.leaves(pw)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loader_mixed_validation(ckpt):
    from matrix_eyes_tpu.errors import LoaderError
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    with pytest.raises(LoaderError):
        load_checkpoint(ckpt, dtype=jnp.float32, mixed_bf16=True)
    with pytest.raises(LoaderError):
        load_checkpoint(ckpt, dtype=jnp.bfloat16, mixed_bf16=True,
                        quantize_int8=True)


def test_api_session_mixed(ckpt, tmp_path):
    """The product surface: a mixed session produces a depth map close to
    the f32 session's on the same image."""
    from matrix_eyes_tpu.api import MatrixEyes

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (48, 64, 3), np.uint8)

    inv_m = MatrixEyes(ckpt, dtype="mixed").inverse_depth(
        img, focal_length_35mm=35.0)
    inv_32 = MatrixEyes(ckpt, dtype="f32").inverse_depth(
        img, focal_length_35mm=35.0)
    inv_16 = MatrixEyes(ckpt, dtype="bf16").inverse_depth(
        img, focal_length_35mm=35.0)

    em = float(np.mean(np.abs(inv_m - inv_32)))
    e16 = float(np.mean(np.abs(inv_16 - inv_32)))
    assert em < e16 / 5, f"mixed {em} not << bf16 {e16}"


def test_cli_accepts_mixed_dtype():
    from matrix_eyes_tpu.cli import parse_args

    args = parse_args(["--dtype=mixed", "a.jpg", "b.png"])
    assert args.dtype == "mixed"
