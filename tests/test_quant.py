"""Int8 quantized ViT path (ops/quant.py, --dtype int8).

The reference has no quantized mode (Burn f32/f16/bf16 only,
reconstruction.rs:15-20); this is the TPU-native int8-MXU extension.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import TINY, RuntimeConfig
from matrix_eyes_tpu.models import depth_pro, init, vit
from matrix_eyes_tpu.models.spec import param_spec
from matrix_eyes_tpu.ops import quant

import torch_ref


def test_quantize_weight_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 32, 16)) * 0.05, jnp.float32)
    qw, sw = quant.quantize_weight(w)
    assert qw.dtype == jnp.int8 and qw.shape == w.shape
    assert sw.dtype == jnp.float32 and sw.shape == (4, 16)
    back = np.asarray(qw, np.float32) * np.asarray(sw)[:, None, :]
    # symmetric per-channel: error bounded by scale/2 = amax/254
    amax = np.abs(np.asarray(w)).max(axis=-2, keepdims=True)
    assert (np.abs(back - np.asarray(w)) <= amax / 254 + 1e-9).all()


def test_quantize_act_per_token():
    x = jnp.asarray([[1.0, -2.0, 0.5], [0.0, 0.0, 0.0]], jnp.float32)
    q, s = quant.quantize_act(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 1)
    np.testing.assert_array_equal(np.asarray(q)[0], [64, -127, 32])
    np.testing.assert_array_equal(np.asarray(q)[1], [0, 0, 0])  # all-zero row safe


def test_qlinear_close_to_linear():
    from matrix_eyes_tpu.ops import nn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 40, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 48)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(48,)) * 0.1, jnp.float32)
    qw, sw = quant.quantize_weight(w)
    y = np.asarray(quant.qlinear(x, qw, sw, b), np.float32)
    want = np.asarray(nn.linear(x, w, b), np.float32)
    # int8 x int8 with per-token/per-channel scales: ~1% relative on
    # well-conditioned inputs
    denom = np.maximum(np.abs(want), 1.0)
    assert (np.abs(y - want) / denom).mean() < 0.01


def test_quantize_params_matches_spec_and_device_variant():
    params = init.init_params(TINY, seed=3, dtype=jnp.bfloat16)
    host = jax.tree.map(np.asarray, params)
    q_np = quant.quantize_params(host)
    q_dev = quant.quantize_params_device(params)
    qspec = quant.quantize_spec(param_spec(TINY))

    leaves_np, tree_np = jax.tree.flatten(q_np)
    leaves_dev, tree_dev = jax.tree.flatten(q_dev)
    leaves_spec, tree_spec = jax.tree.flatten(qspec)
    assert tree_np == tree_spec == tree_dev
    for a, d, s in zip(leaves_np, leaves_dev, leaves_spec):
        assert tuple(a.shape) == tuple(s.shape) == tuple(d.shape)
        if jnp.dtype(s.dtype) == jnp.int8:  # quantized weights
            assert jnp.dtype(a.dtype) == jnp.dtype(d.dtype) == jnp.int8
    # the two variants quantize identically up to rounding-mode noise
    for a, d in zip(leaves_np, leaves_dev):
        if a.dtype == np.int8:
            assert (np.abs(a.astype(np.int32) -
                           np.asarray(d, np.int32)) <= 1).mean() == 1.0

    # non-ViT parts untouched
    assert "conv0_w" in q_np["head"] and q_np["head"]["conv0_w"].dtype != np.int8
    blocks = q_np["encoder"]["patch_encoder"]["blocks"]
    assert "qkv_w" not in blocks and blocks["qkv_qw"].dtype == np.int8
    assert blocks["fc2_qw"].dtype == np.int8  # weight-only still stored int8


def test_quantized_forward_close_to_float():
    cfg = TINY
    params = init.init_params(cfg, seed=5, dtype=jnp.float32)
    qparams = quant.quantize_params_device(params)
    img = jax.random.normal(jax.random.PRNGKey(0),
                            (1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    inv, fov = jax.jit(lambda p, im: depth_pro.forward_with_fov(cfg, p, im, False))(
        params, img)
    inv_q, fov_q = jax.jit(lambda p, im: depth_pro.forward_with_fov(cfg, p, im, False))(
        qparams, img)
    assert inv_q.shape == inv.shape
    a, b = np.asarray(inv, np.float32), np.asarray(inv_q, np.float32)
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-2)
    assert rel.mean() < 0.15  # tiny random net: sanity bound, not a contract
    assert np.isfinite(b).all()


def test_runtime_config_rejects_non_bf16_quant():
    with pytest.raises(ValueError):
        RuntimeConfig(dtype=jnp.float32, quantize_int8=True)
    rc = RuntimeConfig(quantize_int8=True)
    assert rc.resolved_dtype() == jnp.bfloat16


def test_parse_dtype_policy():
    from matrix_eyes_tpu.config import parse_dtype_policy

    assert parse_dtype_policy("int8") == (jnp.bfloat16, True, False)
    assert parse_dtype_policy("bf16") == (jnp.bfloat16, False, False)
    with pytest.raises(ValueError):
        parse_dtype_policy("int4")


def test_cli_accepts_int8():
    from matrix_eyes_tpu.cli import parse_args

    args = parse_args(["--dtype=int8", "a.jpg", "b.png"])
    assert args.dtype == "int8"


def test_quantized_tp_matches_single_device():
    """int8 weights under tensor parallelism: shard_params permutes the
    int8 qkv columns AND their per-output-channel scales to the
    head-group-major layout (qkv_gqw/qkv_gsw), and the full sharded forward
    must match the single-device quantized forward. Int8 matmuls accumulate
    in int32 (deterministic under resharding); the tolerance covers the f32
    reduction reorder of the row-parallel proj/fc2 all-reduces."""
    from matrix_eyes_tpu.parallel.sharding import (
        make_mesh,
        patch_sharded,
        shard_batch,
        shard_params,
    )

    cfg = TINY
    params = init.init_params(cfg, seed=7, dtype=jnp.float32)
    qparams = quant.quantize_params_device(params)
    rng = np.random.RandomState(8)
    img = jnp.asarray(rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3))
                      .astype(np.float32))

    ref_inv, ref_fov = jax.jit(
        lambda p, im: depth_pro.forward_with_fov.__wrapped__(cfg, p, im))(
        qparams, img)

    mesh = make_mesh(8, model=2)
    sparams = shard_params(qparams, mesh, num_heads=cfg.num_heads)
    blocks = sparams["encoder"]["patch_encoder"]["blocks"]
    assert "qkv_gqw" in blocks and blocks["qkv_gqw"].dtype == jnp.int8
    assert blocks["qkv_gsw"].dtype == jnp.float32
    simg = shard_batch(img, mesh)
    with patch_sharded(mesh):
        inv, fov = jax.jit(
            lambda p, im: depth_pro.forward_with_fov.__wrapped__(cfg, p, im))(
            sparams, simg)

    # rtol/atol sized for quantization-boundary chatter: a reordered f32
    # sum can flip a per-token round() by one step, so a handful of
    # elements legitimately move ~1e-4 relative (measured max abs 4e-3 at
    # inverse depths ~20; mean rel ~1e-6)
    a, b = np.asarray(ref_inv, np.float64), np.asarray(inv, np.float64)
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=5e-3)
    assert (np.abs(a - b) / np.maximum(np.abs(a), 1e-2)).mean() < 1e-4
    np.testing.assert_allclose(np.asarray(fov), np.asarray(ref_fov),
                               rtol=2e-4, atol=1e-4)


def test_quantized_tp_flash_routing(monkeypatch):
    """Under the registered TP mesh the quantized path must route attention
    through the fused kernel per model-axis shard with H/k heads (same stub
    strategy as test_parallel.py: interpret-mode Pallas deadlocks inside
    shard_map on the virtual CPU mesh)."""
    import dataclasses

    from matrix_eyes_tpu.config import MID
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.ops import flash_attention
    from matrix_eyes_tpu.parallel.sharding import (
        make_mesh,
        patch_sharded,
        shard_params,
    )

    calls = []

    def reference_qkv_attention(qkv, num_heads, scale, n_valid=None, **kw):
        B, N, C3 = qkv.shape
        C = C3 // 3
        D = C // num_heads
        calls.append((B, num_heads))
        q, k, v = (qkv[..., i * C:(i + 1) * C].reshape(B, N, num_heads, D)
                   .transpose(0, 2, 1, 3) for i in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        if n_valid is not None and n_valid < N:
            s = jnp.where(jnp.arange(N)[None, None, None, :] >= n_valid,
                          jnp.float32(-1e30), s)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return o.transpose(0, 2, 1, 3).reshape(B, N, C)

    # smallest geometry whose per-shard head group is lane-alignable at
    # k=2: H=8, D=32 -> H_loc=4, 4*32=128 features
    cfg = dataclasses.replace(MID, embed_dim=256, num_heads=8)
    full = init.init_params(cfg, seed=21)
    qfull = quant.quantize_params_device(full)
    p_ref = qfull["encoder"]["patch_encoder"]
    rng = np.random.RandomState(22)
    x = jnp.asarray(rng.uniform(-1, 1, (4, cfg.vit_img_size, cfg.vit_img_size, 3))
                    .astype(np.float32))
    want, _ = vit.forward_features(cfg, p_ref, x, use_flash=False)

    monkeypatch.setattr(flash_attention, "attention_flash_qkv",
                        reference_qkv_attention)
    mesh = make_mesh(8, model=2)
    sparams = shard_params(qfull, mesh, num_heads=cfg.num_heads)
    with patch_sharded(mesh):
        got, _ = vit.forward_features(cfg, sparams["encoder"]["patch_encoder"],
                                      x, use_flash=True)
    assert calls and all(h == cfg.num_heads // 2 for _, h in calls), \
        f"kernel should see per-shard head groups, saw {set(calls)}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_quantized_tp_grouped_params_require_mesh_context():
    from matrix_eyes_tpu.parallel.sharding import make_mesh, shard_params

    params = init.init_params(TINY, seed=7, dtype=jnp.bfloat16,
                              include_fov=False)
    qparams = quant.quantize_params_device(params)
    mesh = make_mesh(8, model=2)
    sparams = shard_params(qparams, mesh, num_heads=TINY.num_heads)
    p = sparams["encoder"]["patch_encoder"]
    assert "qkv_gqw" in p["blocks"]
    x = jnp.zeros((1, TINY.vit_img_size, TINY.vit_img_size, 3), jnp.bfloat16)
    from matrix_eyes_tpu.models import vit

    with pytest.raises(ValueError, match="patch_sharded"):
        vit.forward_features(cfg=TINY, params=p, x=x, use_flash=False)
    # pure data-parallel replication needs no permute and no context
    shard_params(qparams, make_mesh(4, model=1))


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("quant_loader")
    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=31)
    path = str(d / "m.pt")
    torch.save(tm.state_dict(), path)
    return path


def test_loader_quantize_and_packed8_roundtrip(ckpt, capsys):
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    cfg, p1 = load_checkpoint(ckpt, dtype=jnp.bfloat16, quantize_int8=True,
                              convert_checkpoints=True)
    blocks = p1["encoder"]["patch_encoder"]["blocks"]
    assert blocks["qkv_qw"].dtype == jnp.int8
    assert blocks["qkv_sw"].dtype == jnp.float32
    assert blocks["norm1_scale"].dtype == jnp.bfloat16
    stem = os.path.splitext(ckpt)[0]
    assert os.path.exists(f"{stem}-encoder.packed8.npy")

    # warm load straight from the packed8 cache: quantized leaves (int8
    # weights, f32 scales) are stored exactly; other float leaves follow the
    # f16 on-disk cache convention (mod.rs:211-227), like every other cache.
    capsys.readouterr()
    cfg2, p2 = load_checkpoint(ckpt, dtype=jnp.bfloat16, quantize_int8=True)
    # ... and it must be the packed8 fast path, not a silent validation
    # failure falling back to host re-quantization
    assert "re-quantizing" not in capsys.readouterr().err
    assert cfg2 == cfg
    l1, t1 = jax.tree.flatten(p1)
    l2, t2 = jax.tree.flatten(p2)
    assert t1 == t2
    for a, b in zip(l1, l2):
        assert a.dtype == b.dtype
        if a.dtype in (jnp.int8, jnp.float32):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            want = np.asarray(a, np.float32).astype(np.float16)
            np.testing.assert_array_equal(want, np.asarray(b, np.float32).astype(np.float16))

    # float load of the same checkpoint is unaffected by the int8 caches
    _, pf = load_checkpoint(ckpt, dtype=jnp.bfloat16)
    assert "qkv_w" in pf["encoder"]["patch_encoder"]["blocks"]


def test_int8_reproducible_across_cache_states(tmp_path):
    """The int8 model must be a pure function of the checkpoint, not of
    which cache files happen to exist: a cold load (straight from the .pt)
    and a warm re-quantization from the f16 float caches both quantize from
    the f16 on-disk convention, so amax/scales/codes agree exactly."""
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=37)
    path = str(tmp_path / "m.pt")
    torch.save(tm.state_dict(), path)

    # cold: no caches at all; writes float + packed8 caches
    _, p_cold = load_checkpoint(path, dtype=jnp.bfloat16, quantize_int8=True,
                                convert_checkpoints=True)
    # drop only the packed8 caches -> next int8 load re-quantizes from the
    # f16 float caches (the divergent path the f16 convention closes)
    removed = 0
    for f in os.listdir(tmp_path):
        if ".packed8." in f:
            os.remove(os.path.join(tmp_path, f))
            removed += 1
    assert removed, "expected packed8 caches to exist"
    _, p_warm = load_checkpoint(path, dtype=jnp.bfloat16, quantize_int8=True)

    l1, t1 = jax.tree.flatten(p_cold)
    l2, t2 = jax.tree.flatten(p_warm)
    assert t1 == t2
    for a, b in zip(l1, l2):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_int8_independent_of_cache_writer_dtype(tmp_path):
    """Caches must hold the checkpoint's canonical f16 rounding regardless
    of the runtime dtype of the run that wrote them: quantizing warm from
    caches written by an f32 run must equal quantizing cold from the .pt.
    (Regression: converting at the runtime dtype wrote f16(bf16(x)) caches
    from bf16 runs but f16(x) from f32 runs, so the same checkpoint gave
    two different int8 models depending on who populated the cache.)"""
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=38)
    path = str(tmp_path / "m.pt")
    torch.save(tm.state_dict(), path)

    # an f32 run writes the float caches
    load_checkpoint(path, dtype=jnp.float32, convert_checkpoints=True)
    # warm int8: quantizes from those caches
    _, p_warm = load_checkpoint(path, dtype=jnp.bfloat16, quantize_int8=True)

    # cold int8: same checkpoint, no caches anywhere
    cold_dir = tmp_path / "cold"
    cold_dir.mkdir()
    path2 = str(cold_dir / "m.pt")
    torch.save(tm.state_dict(), path2)
    _, p_cold = load_checkpoint(path2, dtype=jnp.bfloat16, quantize_int8=True)

    l1, t1 = jax.tree.flatten(p_warm)
    l2, t2 = jax.tree.flatten(p_cold)
    assert t1 == t2
    for a, b in zip(l1, l2):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_corrupt_packed_cache_is_loader_error_on_int8_path(tmp_path):
    """A truncated packed float cache must raise the same clean LoaderError
    on the int8 warm path as on the float path (regression: the int8 host
    reader skipped the blob-size check and escaped with a raw ValueError)."""
    from matrix_eyes_tpu.pt.loader import LoaderError, load_checkpoint

    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=39)
    path = str(tmp_path / "m.pt")
    torch.save(tm.state_dict(), path)
    load_checkpoint(path, dtype=jnp.bfloat16, convert_checkpoints=True)

    # truncate one packed blob (keep a valid npy header so only the size
    # validation can catch it)
    packed = [f for f in os.listdir(tmp_path) if f.endswith(".packed.npy")]
    assert packed
    victim = os.path.join(tmp_path, packed[0])
    blob = np.load(victim)
    with open(victim, "wb") as f:
        np.save(f, blob[: blob.size // 2])

    with pytest.raises(LoaderError, match="corrupt|stale"):
        load_checkpoint(path, dtype=jnp.bfloat16, quantize_int8=True)


def test_loader_stale_packed8_scheme_falls_back(ckpt, capsys):
    """An old-scheme packed8 cache must not fail the warm load: the loader
    warns, re-quantizes from the float caches, and (with convert) rewrites
    the cache in the current scheme."""
    import json

    from matrix_eyes_tpu.pt import loader
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    # ensure caches exist, then damage one part's packed8 manifest scheme
    load_checkpoint(ckpt, dtype=jnp.bfloat16, quantize_int8=True,
                    convert_checkpoints=True)
    _, man = loader._packed8_paths(ckpt, "head")
    with open(man) as f:
        d = json.load(f)
    d["scheme"] = "vit-int8-v1"
    with open(man, "w") as f:
        json.dump(d, f)

    _, p = load_checkpoint(ckpt, dtype=jnp.bfloat16, quantize_int8=True,
                           convert_checkpoints=True)
    assert "conv0_w" in p["head"]
    assert "re-quantizing" in capsys.readouterr().err
    with open(man) as f:
        assert json.load(f)["scheme"] == loader._PACKED8_SCHEME


def test_loader_rejects_non_bf16_quant(ckpt):
    from matrix_eyes_tpu.errors import LoaderError
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    with pytest.raises(LoaderError):
        load_checkpoint(ckpt, dtype=jnp.float32, quantize_int8=True)
