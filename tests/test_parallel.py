"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import TINY
from matrix_eyes_tpu.models import depth_pro
from matrix_eyes_tpu.models.init import init_params
from matrix_eyes_tpu.parallel import (
    make_mesh,
    patch_sharded,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def params():
    return init_params(TINY, seed=0)


def _forward(cfg, params, img):
    inv, fov_deg = depth_pro.forward_with_fov.__wrapped__(cfg, params, img)
    return inv, fov_deg


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_matches_single_device(params, model_parallel):
    """The sharded program must be numerically equivalent to the
    single-device one (same math, collectives inserted by XLA)."""
    cfg = TINY
    rng = np.random.RandomState(0)
    img_np = rng.uniform(-1, 1, size=(1, cfg.img_size, cfg.img_size, 3)).astype(np.float32)

    ref_inv, ref_fov = jax.jit(lambda p, x: _forward(cfg, p, x))(params, jnp.asarray(img_np))

    mesh = make_mesh(8, model=model_parallel)
    sparams = shard_params(params, mesh, num_heads=cfg.num_heads)
    simg = shard_batch(jnp.asarray(img_np), mesh)
    with patch_sharded(mesh):
        inv, fov = jax.jit(lambda p, x: _forward(cfg, p, x))(sparams, simg)

    np.testing.assert_allclose(np.asarray(inv), np.asarray(ref_inv), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fov), np.asarray(ref_fov), rtol=2e-4, atol=1e-4)


def test_sharded_matches_single_device_model4():
    """TP degree 4 (one head per shard on MID's 4 heads) on a (2, 4) mesh:
    no current production mesh uses it, but the head-group layout claims
    any divisor of num_heads works -- prove it numerically."""
    from matrix_eyes_tpu.config import MID

    cfg = MID
    params4 = init_params(cfg, seed=3)
    rng = np.random.RandomState(4)
    img_np = rng.uniform(-1, 1, size=(1, cfg.img_size, cfg.img_size, 3)).astype(np.float32)

    ref_inv, ref_fov = jax.jit(lambda p, x: _forward(cfg, p, x))(
        params4, jnp.asarray(img_np))

    mesh = make_mesh(8, model=4)
    sparams = shard_params(params4, mesh, num_heads=cfg.num_heads)
    simg = shard_batch(jnp.asarray(img_np), mesh)
    with patch_sharded(mesh):
        inv, fov = jax.jit(lambda p, x: _forward(cfg, p, x))(sparams, simg)

    # atol 1e-3: 4-way reductions reorder f32 sums; through the 1/f_norm
    # division and the output clamp ~0.1% of elements land within 6e-4
    # absolute of the single-device value but fail a pure rtol check
    np.testing.assert_allclose(np.asarray(inv), np.asarray(ref_inv),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fov), np.asarray(ref_fov), rtol=2e-4, atol=1e-4)


def test_data_parallel_batch(params):
    """Multi-image throughput: batch sharded over the data axis."""
    cfg = TINY
    mesh = make_mesh(8, model=1)
    rng = np.random.RandomState(1)
    img_np = rng.uniform(-1, 1, size=(8, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    simg = shard_batch(jnp.asarray(img_np), mesh)
    sparams = shard_params(params, mesh)
    with patch_sharded(mesh):
        inv, _ = jax.jit(lambda p, x: _forward(cfg, p, x))(sparams, simg)
    assert inv.shape == (8, cfg.img_size, cfg.img_size)
    # per-image results must equal the single-image run
    ref, _ = jax.jit(lambda p, x: _forward(cfg, p, x))(params, jnp.asarray(img_np[3:4]))
    np.testing.assert_allclose(np.asarray(inv[3]), np.asarray(ref[0]), rtol=2e-4, atol=1e-5)


def test_graft_entry_lowers():
    """Run the driver entry exactly as the driver does: a FRESH
    interpreter with no prearranged JAX env. Isolation is the point, not
    a convenience: (a) dryrun_multichip's _provision_cpu_mesh may
    clear_backends, which must never touch the suite's own live backend;
    (b) executing it inside the suite process (torch + many jax clients
    + pytest threads) intermittently SIGABRTed in XLA CPU runtime
    teardown with no Python-level error -- a fresh process is the
    supported contract and has never aborted."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True, text=True, timeout=1800, env=env)
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-2000:])
    assert "dryrun_multichip ok: n=8" in proc.stdout
    assert "leg depth-pro-compile" in proc.stdout


def test_mid_config_collectives_in_compiled_hlo():
    """Compile (not run) the MID-size sharded forward on the (4, 2) mesh and
    assert the GSPMD partitioner produced what the layout promises:

    * TP all-reduces inside the ViT blocks (proj/fc2 row-parallel sums),
    * a patch-redistribution collective where the overlapping pyramid
      merges (GSPMD may lower the gather as all-gather or all-to-all /
      collective-permute chains),
    * NO all-gather: with the head-group qkv layout (shard_params
      num_heads) attention is head-local per shard, so the per-block qkv
      all-gathers the legacy layout needed (4 of them, measured 2.0 MB on
      this config) must be gone,
    * the patch axis is actually split: the padded 36-patch pyramid appears
      as a 9-patch per-device tensor. If GSPMD ever stops sharding the
      patch axis, the full 36-patch shape reappears and this fails.
    """
    from matrix_eyes_tpu.config import MID

    cfg = MID
    mesh = make_mesh(8, model=2)
    params = shard_params(init_params(cfg, seed=0), mesh, num_heads=cfg.num_heads)
    img = shard_batch(jnp.ones((1, cfg.img_size, cfg.img_size, 3), jnp.float32), mesh)

    with patch_sharded(mesh):
        compiled = jax.jit(
            lambda p, im: _forward(cfg, p, im)).lower(params, img).compile()
    txt = compiled.as_text()

    assert "all-reduce" in txt, "expected TP all-reduces in the partitioned HLO"
    assert any(c in txt for c in
               ("all-to-all", "all-gather", "collective-permute")), \
        "expected a patch-merge redistribution collective"
    # The head-group qkv layout makes attention head-local per shard, so no
    # collective may gather a token-axis activation (the legacy layout's 4
    # per-block qkv all-gathers carried the token axis in their result
    # shape). A patch-merge all-gather over NHWC feature maps is a
    # legitimate GSPMD lowering and stays allowed -- only token-shaped
    # gathers are banned, not the substring globally.
    import re

    tokens = str((cfg.vit_img_size // cfg.patch_size) ** 2 + 1)
    for line in txt.splitlines():
        if "all-gather(" in line or "all-gather-start(" in line:
            m = re.search(r"[a-z0-9]+\[([\d,]*)\]", line)
            assert not (m and tokens in m.group(1).split(",")), \
                f"qkv-shaped all-gather found: {line.strip()}"
    # 1 image -> 35 patches padded to 36 over data=4 -> 9 per device
    per_device_pyramid = f"[9,{cfg.vit_img_size},{cfg.vit_img_size},3]"
    full_pyramid = f"[36,{cfg.vit_img_size},{cfg.vit_img_size},3]"
    assert per_device_pyramid in txt, "patch axis is not sharded per-device"
    assert full_pyramid not in txt, "unsharded full pyramid found in HLO"


def test_depth_pro_production_scale_compile_and_collectives():
    """The MID assertions at PRODUCTION dimensions (round-5 verdict): lower
    + compile the real DEPTH_PRO sharded forward on the virtual (4, 2)
    mesh with fully abstract inputs (no 3.8 GB of parameters, no
    execution) and assert GSPMD keeps the 35->36-padded patch axis split,
    emits the TP collective set, and never gathers a token-axis
    activation. The collective byte budget is read off the production
    executable -- the number docs/SCALING.md's projection cites."""
    from matrix_eyes_tpu.config import DEPTH_PRO
    from matrix_eyes_tpu.parallel.production_check import (
        compile_production_forward,
    )

    report = compile_production_forward(DEPTH_PRO, make_mesh(8, model=2))
    assert report["patches_per_device"] == 9
    assert report["collectives"].get("all-reduce", {}).get("count", 0) > 0
    # the merge redistribution moves megabytes, not gigabytes: the ICI
    # budget stays negligible next to ~92 ms of patch-ViT compute
    assert 0 < report["collective_mbytes_total"] < 2000


def test_production_check_degenerate_meshes():
    """The compile check must hold on meshes with a size-1 axis too: on
    (1, 2) the full pyramid on one shard is legitimate (data=1), and the
    patch count is derived from the config, not hardcoded to production
    (dryrun_multichip(2) runs exactly this shape)."""
    from matrix_eyes_tpu.config import MID
    from matrix_eyes_tpu.parallel.production_check import (
        compile_production_forward,
    )

    report = compile_production_forward(MID, make_mesh(2, model=2))
    assert report["patches_per_device"] == 35  # 25 + 9 + 1, unsharded
    assert report["collectives"].get("all-reduce", {}).get("count", 0) > 0


def test_flash_shard_mapped_on_data_mesh(monkeypatch):
    # On a pure data-parallel mesh the fused attention kernel runs
    # per-shard under shard_map (a pallas_call is opaque to GSPMD); the
    # result must match the unsharded XLA attention path. MID is the
    # smallest qkv-fusable config (head geometry lane-alignable).
    #
    # Interpret-mode Pallas inside shard_map deadlocks on the virtual CPU
    # mesh, so this test validates the shard_map routing/specs with a
    # same-signature reference attention in the kernel's place; the kernel
    # numerics themselves are covered by tests/test_flash_attention.py on
    # the identical math.
    import numpy as np

    from matrix_eyes_tpu.config import MID
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params
    from matrix_eyes_tpu.ops import flash_attention

    calls = []

    def reference_qkv_attention(qkv, num_heads, scale, n_valid=None, **kw):
        B, N, C3 = qkv.shape
        C = C3 // 3
        D = C // num_heads
        calls.append(B)  # per-shard batch
        q, k, v = (qkv[..., i * C:(i + 1) * C].reshape(B, N, num_heads, D)
                   .transpose(0, 2, 1, 3) for i in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        if n_valid is not None and n_valid < N:
            s = jnp.where(jnp.arange(N)[None, None, None, :] >= n_valid,
                          jnp.float32(-1e30), s)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return o.transpose(0, 2, 1, 3).reshape(B, N, C)

    cfg = MID
    p = init_params(cfg, seed=11)["encoder"]["patch_encoder"]
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.uniform(-1, 1, (8, cfg.vit_img_size, cfg.vit_img_size, 3))
                    .astype(np.float32))
    want, _ = vit.forward_features(cfg, p, x, use_flash=False)

    monkeypatch.setattr(flash_attention, "attention_flash_qkv",
                        reference_qkv_attention)
    mesh = make_mesh(8, model=1)
    with patch_sharded(mesh):
        assert vit._flash_sharding(8) not in (None, True)  # shard_map path
        got, _ = vit.forward_features(cfg, p, x, use_flash=True)
    assert calls and all(b == 1 for b in calls), \
        f"kernel should see per-shard batches of 1, saw {set(calls)}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_disabled_on_checkpoint_layout_under_tp_mesh():
    # Parameters still in checkpoint [q|k|v] order (never transformed by
    # shard_params) under a TP mesh: the qkv features are GSPMD-sharded
    # mid-section, so the flash kernels must silently yield to the XLA
    # attention path (same numerics, no opaque custom call inside the
    # GSPMD computation).
    import numpy as np

    from matrix_eyes_tpu.config import MID
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params

    cfg = MID
    p = init_params(cfg, seed=11)["encoder"]["patch_encoder"]
    assert "qkv_gw" not in p["blocks"]
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.uniform(-1, 1, (4, cfg.vit_img_size, cfg.vit_img_size, 3))
                    .astype(np.float32))
    want, _ = vit.forward_features(cfg, p, x, use_flash=False)

    mesh = make_mesh(8, model=2)
    with patch_sharded(mesh):
        assert vit._flash_sharding(4) is None
        got, _ = vit.forward_features(cfg, p, x, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_grouped_params_require_mesh_context():
    # Head-group-permuted parameters outside their mesh context must fail
    # loudly (silently misreading the layout would corrupt numerics).
    import pytest as _pytest

    from matrix_eyes_tpu.config import MID
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params

    cfg = MID
    full = init_params(cfg, seed=11)
    mesh = make_mesh(8, model=2)
    sparams = shard_params(full, mesh, num_heads=cfg.num_heads)
    p = sparams["encoder"]["patch_encoder"]
    assert "qkv_gw" in p["blocks"]
    x = jnp.zeros((1, cfg.vit_img_size, cfg.vit_img_size, 3), jnp.float32)
    with _pytest.raises(ValueError, match="patch_sharded"):
        vit.forward_features(cfg, p, x, use_flash=False)


def test_tp_grouped_params_reject_mismatched_degree():
    # Parameters permuted for k=2 but run inside a k=4 mesh context: the
    # head-divisibility guard alone would pass (8 % 4 == 0) while the
    # reshape mixed q/k/v sections across head groups. The permutation
    # degree recorded in qkv_gb's group axis must refuse loudly.
    import pytest as _pytest

    from matrix_eyes_tpu.config import MID
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params

    cfg = MID
    full = init_params(cfg, seed=11)
    sparams = shard_params(full, make_mesh(8, model=2),
                           num_heads=cfg.num_heads)
    p = sparams["encoder"]["patch_encoder"]
    assert p["blocks"]["qkv_gb"].shape[-2] == 2
    x = jnp.zeros((1, cfg.vit_img_size, cfg.vit_img_size, 3), jnp.float32)
    with patch_sharded(make_mesh(8, model=4)):
        with _pytest.raises(ValueError, match="degree 2"):
            vit.forward_features(cfg, p, x, use_flash=False)


def _tp_fusable_cfg():
    # Smallest geometry whose per-shard head group is lane-alignable at
    # k=2: H=8, D=32 -> H_loc=4, 4*32=128 features.
    import dataclasses

    from matrix_eyes_tpu.config import MID

    return dataclasses.replace(MID, embed_dim=256, num_heads=8)


def test_flash_kernel_engages_under_registered_tp_mesh(monkeypatch):
    # With the head-group-major layout registered by shard_params, the
    # fused attention kernel runs per model-axis shard with H/k heads under
    # shard_map. Same stub strategy as the data-parallel routing test
    # (interpret-mode Pallas deadlocks inside shard_map on the virtual CPU
    # mesh): a same-signature reference computes the math; the kernel
    # numerics are covered by tests/test_flash_attention.py.
    import numpy as np

    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params
    from matrix_eyes_tpu.ops import flash_attention

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

    cfg = _tp_fusable_cfg()
    full = init_params(cfg, seed=21)
    p_ref = full["encoder"]["patch_encoder"]
    rng = np.random.RandomState(22)
    x = jnp.asarray(rng.uniform(-1, 1, (4, cfg.vit_img_size, cfg.vit_img_size, 3))
                    .astype(np.float32))
    want, _ = vit.forward_features(cfg, p_ref, x, use_flash=False)

    monkeypatch.setattr(flash_attention, "attention_flash_qkv",
                        reference_qkv_attention)
    mesh = make_mesh(8, model=2)
    sparams = shard_params(full, mesh, num_heads=cfg.num_heads)
    assert "qkv_gw" in sparams["encoder"]["patch_encoder"]["blocks"]
    with patch_sharded(mesh):
        got, _ = vit.forward_features(cfg, sparams["encoder"]["patch_encoder"],
                                      x, use_flash=True)
    assert calls and all(h == cfg.num_heads // 2 for _, h in calls), \
        f"kernel should see per-shard head groups, saw {set(calls)}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_xla_path_matches_on_permuted_layout():
    # Registered TP layout but a geometry the kernel cannot lane-align
    # (H_loc * D not 128-divisible): attention takes the permuted-layout
    # XLA path, which must match the unpermuted single-device forward.
    import numpy as np

    from matrix_eyes_tpu.config import MID
    from matrix_eyes_tpu.models import vit
    from matrix_eyes_tpu.models.init import init_params

    cfg = MID  # H=4, D=32: H_loc=2 -> 64 features, not fusable at k=2
    full = init_params(cfg, seed=31)
    rng = np.random.RandomState(32)
    x = jnp.asarray(rng.uniform(-1, 1, (4, cfg.vit_img_size, cfg.vit_img_size, 3))
                    .astype(np.float32))
    want, _ = vit.forward_features(cfg, full["encoder"]["patch_encoder"], x,
                                   use_flash=False)

    mesh = make_mesh(8, model=2)
    sparams = shard_params(full, mesh, num_heads=cfg.num_heads)
    with patch_sharded(mesh):
        got, _ = vit.forward_features(
            cfg, sparams["encoder"]["patch_encoder"], x, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv_dispatch_shard_mapped_on_data_mesh(monkeypatch):
    # conv3x3_dispatch must shard_map the kernel over a pure data-parallel
    # mesh when the batch divides the axis, and return None otherwise.
    # Same stub strategy as the attention routing test (interpret-mode
    # Pallas deadlocks inside shard_map on the virtual CPU mesh).
    from matrix_eyes_tpu.ops import conv3x3, nn

    calls = []

    def reference_conv(x, w, b=None, skip=None, skip2=None, relu_in=False,
                       **kw):
        calls.append(x.shape[0])
        h = nn.relu(x) if relu_in else x
        y = nn.conv2d(h, w, b, padding=1)
        if skip is not None:
            y = y + skip
        if skip2 is not None:
            y = y + skip2
        return y

    monkeypatch.setattr(conv3x3, "conv3x3_pallas", reference_conv)
    monkeypatch.setattr(conv3x3, "conv3x3_supported", lambda *a, **k: True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 8, 16, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, 128, 128)).astype(np.float32))
    skip = jnp.asarray(rng.uniform(-1, 1, (8, 8, 16, 128)).astype(np.float32))
    want = nn.conv2d(nn.relu(x), w, padding=1) + skip

    mesh = make_mesh(8, model=1)
    with patch_sharded(mesh):
        got = conv3x3.conv3x3_dispatch(x, w, None, skip=skip, relu_in=True)
        assert got is not None
        # non-dividing batch -> None (XLA fallback)
        assert conv3x3.conv3x3_dispatch(x[:3], w) is None
    assert calls and all(b == 1 for b in calls), \
        f"kernel should see per-shard batches of 1, saw {set(calls)}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # tensor-parallel mesh: the kernel still engages, shard_mapped over the
    # data axis with the model axis unmapped (the decoder params are
    # replicated over model, so per-model-shard compute is identical)
    calls.clear()
    mesh_tp = make_mesh(8, model=2)
    with patch_sharded(mesh_tp):
        got_tp = conv3x3.conv3x3_dispatch(x, w, None, skip=skip, relu_in=True)
        assert got_tp is not None
        # batch not dividing the data axis -> None even on a TP mesh
        assert conv3x3.conv3x3_dispatch(x[:3], w) is None
    assert calls and all(b == 2 for b in calls), \
        f"kernel should see per-data-shard batches of 2, saw {set(calls)}"
    np.testing.assert_allclose(np.asarray(got_tp), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # multi-device runtime without a mesh context -> None
    assert conv3x3.conv3x3_dispatch(x, w) is None


def test_bench_batch_mesh_compile_only(capsys):
    """The mesh-parameterised throughput bench (scripts/bench_batch.py,
    BASELINE config 5) must stay runnable: at --config tiny it exercises
    the identical mesh/sharding/compile path on the virtual (4, 2) mesh and
    reports the compiled HLO's collective traffic -- Megatron TP over
    model=2 must show nonzero collective bytes."""
    import importlib.util
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "bench_batch.py")
    spec = importlib.util.spec_from_file_location("bench_batch", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.main(["--config", "tiny", "--data", "4", "--model", "2",
              "--batch", "4", "--compile-only"])
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["mesh"] == {"data": 4, "model": 2}
    assert record["config"] == "tiny"
    assert record["collective_bytes_per_step"] > 0
    kinds = set(record["collectives"])
    assert kinds & {"all-reduce", "reduce-scatter", "all-gather"}, kinds
