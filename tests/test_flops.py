"""Analytic FLOP ledger tests (matrix_eyes_tpu/flops.py).

Structure tests pin the ledger's internal identities; the cross-check test
uses XLA's own per-op cost model on the compiled MID forward as an
independent oracle (the two count slightly different things -- XLA counts
elementwise ops and the head's composed formulation, the ledger counts the
logical model math -- so the band is deliberately loose but catches any
order-of-magnitude or stage-omission bug).
"""

import dataclasses

import pytest

import jax.numpy as jnp

from matrix_eyes_tpu import flops
from matrix_eyes_tpu.config import DEPTH_PRO, MID


def test_production_ledger_magnitude():
    led = flops.model_flops(DEPTH_PRO)
    # ~19 TFLOP/image: 37 ViT-L forwards (~0.38 TFLOP each) + ~4.2 TFLOP
    # DPT decoder + ~0.6 TFLOP head (docs/PERFORMANCE.md stage ledger)
    assert 15e12 < led["total"] < 25e12
    assert led["patch_vit"] / led["total"] > 0.6
    # 35-patch pyramid batch (encoder.rs:238-250) + image + fov encoders
    assert led["patch_vit"] == pytest.approx(35 * flops.vit_flops(DEPTH_PRO))
    assert led["image_vit"] == flops.vit_flops(DEPTH_PRO)
    assert led["fov_vit"] == flops.vit_flops(DEPTH_PRO)
    assert led["total"] == pytest.approx(
        sum(v for k, v in led.items() if k != "total"))


def test_batch_scales_linearly():
    a = flops.model_flops(MID)
    b = flops.model_flops(MID, batch=4)
    for k in a:
        assert b[k] == pytest.approx(4 * a[k]), k


def test_no_fov_drops_exactly_the_fov_stages():
    a = flops.model_flops(MID)
    b = flops.model_flops(MID, with_fov=False)
    assert "fov_vit" not in b and "fov_head" not in b
    assert b["total"] == pytest.approx(
        a["total"] - a["fov_vit"] - a["fov_head"])


def test_vit_flops_depth_linearity():
    base = flops.vit_flops(MID)
    deeper = flops.vit_flops(dataclasses.replace(MID, depth=MID.depth * 2))
    per_block = (deeper - base) / MID.depth
    N, D, M = MID.seq_len, MID.embed_dim, MID.mlp_ratio
    assert per_block == pytest.approx((8 + 4 * M) * N * D * D + 4 * N * N * D)


def test_xla_cost_model_cross_check():
    import jax

    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models.init import init_params_fast

    cfg = MID
    params = init_params_fast(cfg)
    img = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)

    def fwd(p, im):
        return depth_pro.forward_with_fov.__wrapped__(cfg, p, im, False)

    compiled = jax.jit(fwd).lower(params, img).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    xla = ca.get("flops")
    if not xla:
        from expected_skips import SKIP_NO_XLA_COST_ANALYSIS

        pytest.skip(SKIP_NO_XLA_COST_ANALYSIS)
    led = flops.model_flops(cfg)
    assert 0.85 < xla / led["total"] < 1.25, (xla, led["total"])


def test_mfu_math_and_cpu_peak():
    assert flops.mfu(197e12, 1.0, peak=197e12) == pytest.approx(1.0)
    assert flops.mfu(197e12, 2.0, peak=197e12) == pytest.approx(0.5)
    # the test environment runs on CPU: no published peak, no MFU claim
    assert flops.device_peak_flops() is None
    assert flops.mfu(1e12, 1.0) is None
