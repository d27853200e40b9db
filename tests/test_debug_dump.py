"""Activation dump tooling tests (matrix_eyes_tpu.debug)."""

import numpy as np

import jax.numpy as jnp

from matrix_eyes_tpu.config import TINY
from matrix_eyes_tpu.debug import compare_dumps, dump_stages, save_dump
from matrix_eyes_tpu.models.init import init_params


def test_dump_stages_and_compare(tmp_path):
    cfg = TINY
    params = init_params(cfg, seed=2)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3))
                      .astype(np.float32))
    acts = dump_stages(cfg, params, img)
    expected = {"patch_tokens", "patch_highres0", "patch_highres1",
                "enc_latent0", "enc_latent1", "enc_x0", "enc_x1", "enc_global",
                "dec_features", "dec_lowres", "canonical_inverse_depth", "fov_deg"}
    assert expected <= set(acts)
    assert acts["canonical_inverse_depth"].shape == (1, cfg.img_size, cfg.img_size)

    path = str(tmp_path / "d.npz")
    save_dump(acts, path)
    with np.load(path) as z:
        reloaded = {k: z[k] for k in z.files}
    report = compare_dumps(acts, reloaded)
    assert all(v == 0.0 for v in report.values()), report

    # perturbing one stage shows up in the report
    reloaded["dec_features"] = reloaded["dec_features"] + 1.0
    report = compare_dumps(acts, reloaded)
    assert report["dec_features"] > 0.1
    assert report["canonical_inverse_depth"] == 0.0
