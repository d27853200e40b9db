"""Full-size checkpoint parity gate (<1% relative depth error contract).

Skipped unless a full-size checkpoint and the regenerated parity artifacts
exist (produce them with scripts/parity_real.py -- a full run takes ~25 min
of single-core torch, so the suite validates the artifacts rather than
recomputing them). The committed copies live in docs/parity/.
"""

import glob
import json
import os

import pytest

from expected_skips import SKIP_NO_FULL_CHECKPOINT

CKPT = "/tmp/ckpt_full/depth_pro.pt"
ART_DIRS = [d for d in glob.glob("/tmp/parity*") if
            os.path.exists(os.path.join(d, "stages-f32.json"))]

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CKPT) and ART_DIRS),
    reason=SKIP_NO_FULL_CHECKPOINT)


@pytest.mark.parametrize("art_dir", ART_DIRS)
def test_f32_stage_parity_under_one_percent(art_dir):
    with open(os.path.join(art_dir, "stages-f32.json")) as f:
        r = json.load(f)
    # canonical inverse depth: the model's output before FOV scaling.
    assert r["stage_max_rel"]["canonical_inverse_depth"] < 0.01
    # every intermediate stage stays tight too
    for k, v in r["stage_max_rel"].items():
        assert v < 0.01, (k, v)
    # end-to-end inverse depth, mean relative error: <1% with huge margin
    assert r["e2e_inverse_depth"]["mean_rel"] < 0.01
    # fov agrees to float noise at f32
    assert abs(r["fov_deg"]["jax"] - r["fov_deg"]["torch"]) <= max(
        1e-4 * abs(r["fov_deg"]["torch"]), 1e-5)


@pytest.mark.parametrize("art", sum((glob.glob(os.path.join(d, "tpu-e2e-*.json"))
                                     for d in ART_DIRS), []))
def test_half_precision_canonical_under_one_percent_mean(art):
    with open(art) as f:
        r = json.load(f)
    assert r["canonical"]["mean_rel"] < 0.01, r["mode"]
