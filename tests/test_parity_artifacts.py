"""Always-run gate over the committed parity artifacts (docs/parity/).

tests/test_parity_real.py validates freshly regenerated artifacts in /tmp
and therefore skips on any checkout without a full-size checkpoint; these
tests assert the same contract over the *committed* copies so a fresh
checkout (and CI) fails if an artifact regresses or is replaced with one
outside the BASELINE.md accuracy contract (<1% relative depth error vs the
PyTorch mirror; mod.rs:251-363 is the function being mirrored).
"""

import glob
import json
import os

import pytest

ART_DIR = os.path.join(os.path.dirname(__file__), "..", "docs", "parity")

STAGES_F32 = sorted(glob.glob(os.path.join(ART_DIR, "*-stages-f32.json")))
TPU_E2E = sorted(glob.glob(os.path.join(ART_DIR, "*-tpu-e2e-*.json")))
HF_THREE_WAY = os.path.join(ART_DIR, "hf-three-way.json")


def _load(path):
    with open(path) as f:
        return json.load(f)


def test_artifacts_present():
    # the evidence set itself is part of the contract: losing an artifact
    # silently would un-assert the claim it carried
    assert len(STAGES_F32) >= 3, STAGES_F32
    assert len(TPU_E2E) >= 3, TPU_E2E
    # the mixed weight-precision mode -- the repo's best accuracy-per-byte
    # result -- must stay gated by an always-run artifact (round-5 verdict)
    assert any("mixed" in os.path.basename(p) for p in TPU_E2E), TPU_E2E
    assert os.path.exists(HF_THREE_WAY)


@pytest.mark.parametrize("art", STAGES_F32, ids=os.path.basename)
def test_f32_stage_parity_under_one_percent(art):
    r = _load(art)
    assert r["stage_max_rel"]["canonical_inverse_depth"] < 0.01
    for k, v in r["stage_max_rel"].items():
        assert v < 0.01, (k, v)
    assert r["e2e_inverse_depth"]["mean_rel"] < 0.01
    assert abs(r["fov_deg"]["jax"] - r["fov_deg"]["torch"]) <= max(
        1e-4 * abs(r["fov_deg"]["torch"]), 1e-5)


@pytest.mark.parametrize("art", TPU_E2E, ids=os.path.basename)
def test_half_precision_canonical_contract(art):
    """The enforceable half-precision claim (one number, promised nowhere
    looser, asserted here): canonical mean_rel < 1 % AND p99_rel < 7 %.

    The p99 bound is the honest one the round-3 attribution supports:
    ~85 % of the half-precision tail is WEIGHT rounding (bf16 weights vs
    f32), so no activation policy can push p99 below that floor
    (docs/PARITY_RESULTS.md, scripts/bf16_attribution.py). Committed
    artifacts measure p99 5.2-6.1 % on this fixture class; the
    reference-grade path for tail-sensitive users is --dtype f32 (true-f32
    MXU matmuls, 0.931 s/image -- still under target). The same thresholds
    appear in docs/TRAINED_WEIGHTS_RUNBOOK.md's pass-criteria table.

    The MIXED artifact carries a tighter bound on the same yardstick:
    --dtype mixed keeps only the ViT block matmul weights bf16 (+88 MiB
    of f32 elsewhere). Measured canonical p99 vs torch is 1.05 % -- 6x
    under bf16's 6.1 % -- of which the cross-implementation f32 noise
    floor (JAX/TPU flash+HIGHEST vs torch/CPU) is a large share; the
    same-stack isolation probe is gated separately at p99 < 0.5 %
    (test_mixed_isolation_probe_tail). Regenerate with
    scripts/parity_real.py tpu-e2e --dtype mixed."""
    r = _load(art)
    if "mixed" in os.path.basename(art):
        assert r["canonical"]["mean_rel"] < 0.002, r["mode"]
        assert r["canonical"]["p99_rel"] < 0.02, r["mode"]
        return
    assert r["canonical"]["mean_rel"] < 0.01, r["mode"]
    assert r["canonical"]["p99_rel"] < 0.07, r["mode"]


def test_mixed_isolation_probe_tail():
    """The p99 < 0.5 % claim, on the yardstick that actually measures it:
    mixed vs TRUE-F32 on the same JAX/TPU stack (scripts/
    bf16_attribution.py none mixed -- no cross-implementation noise).
    Committed artifact measures canonical p99 0.225 % / mean 0.017 %."""
    path = os.path.join(ART_DIR, "mixed-vs-f32.jsonl")
    with open(path) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    mixed = next(r for r in recs if r["probe"] == "mixed")
    assert mixed["canonical"]["p99_rel"] < 0.005
    assert mixed["canonical"]["mean_rel"] < 0.001


def test_hf_three_way_cross_check():
    """The torch mirror used as parity ground truth bit-agrees with an
    independent third-party implementation (HuggingFace transformers
    DepthPro) -- the shared-misunderstanding killer from round 2."""
    r = _load(HF_THREE_WAY)
    assert r["mirror_vs_hf_canonical_max_abs"] < 1e-5
    assert r["mirror_vs_hf_fov_abs"] < 1e-3
    # the JAX path agrees with HF within f32 accumulation noise at scale
    assert r["jax_vs_hf_canonical_max_abs"] < 0.05
    assert r["jax_vs_hf_fov_abs"] < 0.01
