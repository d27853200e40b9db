"""Real-checkpoint parity: JAX model vs the PyTorch mirror on the actual
Apple Depth Pro weights (BASELINE.md accuracy contract: <1% relative depth
error vs PyTorch Depth Pro).

Modes:
  stages-f32  CPU, f32 both sides: per-stage max relative difference via
              debug.dump_stages / torch_ref.dump_stages, plus end-to-end
              inverse-depth error. Also saves the torch reference outputs
              (canonical, inv, fov) to <out-dir>/torch_ref_outputs.npz for
              the TPU bf16 comparison.
  e2e-bf16    bf16 on the default (TPU) backend vs the saved torch f32
              reference: end-to-end inverse-depth error.

Usage:
  python scripts/parity_real.py stages-f32 --checkpoint /tmp/ckpt_full/depth_pro.pt \
      --image /tmp/ckpt_full/photo.jpg --out-dir /tmp/parity
  python scripts/parity_real.py e2e-bf16 --checkpoint ... --image ... --out-dir /tmp/parity

Both modes print a JSON report line and write <out-dir>/<mode>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def rel_err(got: np.ndarray, want: np.ndarray, floor: float = 1e-3):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    denom = np.maximum(np.abs(want), floor)
    r = np.abs(got - want) / denom
    return {"mean_rel": float(r.mean()), "max_rel": float(r.max()),
            "p99_rel": float(np.percentile(r, 99))}


def load_inputs(image_path: str, img_size: int):
    """Normalised NHWC f32 input through the repo's own preprocessing."""
    import jax.numpy as jnp
    from matrix_eyes_tpu.io.image import load_source_image
    from matrix_eyes_tpu.pipeline import preprocess_image

    src = load_source_image(image_path, None)
    img = preprocess_image(jnp.asarray(src.rgb), img_size, dtype=jnp.float32)
    return np.asarray(img, np.float32), src


def run_stages_f32(args):
    # Force CPU before any backend init; full-size f32 parity runs on host.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from matrix_eyes_tpu.debug import compare_dumps, dump_stages
    from matrix_eyes_tpu.pt.loader import load_checkpoint
    import torch_ref

    t0 = time.time()
    # use_caches=False: torch loads the .pt's f32 values directly, so the
    # JAX side must too -- routing through the f16 on-disk cache would
    # fold cache rounding into the measured parity
    cfg, params = load_checkpoint(args.checkpoint, dtype=np.float32,
                                  use_caches=False)
    print(f"[jax] params loaded in {time.time()-t0:.0f}s", flush=True)

    img_np, _src = load_inputs(args.image, cfg.img_size)

    t0 = time.time()
    jax_acts = dump_stages(cfg, params, img_np, use_flash=False)
    print(f"[jax] stages in {time.time()-t0:.0f}s", flush=True)
    del params

    t0 = time.time()
    flat = {k: torch.from_numpy(np.asarray(v)) for k, v in
            _read_flat(args.checkpoint).items()}
    tm = torch_ref.DepthPro(cfg)
    missing, unexpected = tm.load_state_dict(flat, strict=False)
    if missing:
        raise SystemExit(f"torch mirror missing keys: {missing[:10]}")
    print(f"[torch] loaded ({len(unexpected)} unused ckpt keys) "
          f"in {time.time()-t0:.0f}s", flush=True)
    tm = tm.float().eval()
    del flat

    x = torch.from_numpy(img_np).permute(0, 3, 1, 2)
    t0 = time.time()
    torch_acts = torch_ref.dump_stages(tm, x)
    with torch.no_grad():
        inv_t = tm(x).numpy()
    print(f"[torch] stages in {time.time()-t0:.0f}s", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(args.out_dir, "torch_ref_outputs.npz"),
        canonical=torch_acts["canonical_inverse_depth"],
        fov_deg=torch_acts["fov_deg"],
        inv=inv_t)

    stage_report = compare_dumps(jax_acts, torch_acts)

    # end-to-end (fov-derived f_norm path), f32 both sides
    del tm, torch_acts["dec_features"]  # free RAM before reloading jax params
    inv_j, fov_j = _jax_e2e(cfg, args.checkpoint, img_np, np.float32)
    report = {
        "mode": "stages-f32",
        "stage_max_rel": stage_report,
        "e2e_inverse_depth": rel_err(inv_j, inv_t),
        "fov_deg": {"jax": float(np.asarray(fov_j).ravel()[0]),
                    "torch": float(torch_acts["fov_deg"].ravel()[0])},
    }
    _emit(args, report)


def _read_flat(path):
    from matrix_eyes_tpu.pt.pickle_reader import read_pt_state_dict

    return read_pt_state_dict(path)


def _jax_e2e(cfg, checkpoint, img_np, dtype):
    inv, fov, _canon = _jax_full(cfg, checkpoint, img_np, dtype)
    return inv, fov


def _jax_full(cfg, checkpoint, img_np, dtype, use_flash=False,
              quantize_weights=None):
    """(inv, fov_deg, canonical) at the given dtype.

    ``dtype`` may be the string ``"mixed"`` for the --dtype mixed weight
    policy (ops/mixed.py: bf16 ViT block matmul weights, f32 everything
    else with true-f32 arithmetic); otherwise a jnp dtype.

    ``quantize_weights``: round-trip the parameters through this dtype
    before running (e.g. f32 compute with bf16-rounded weights isolates
    weight-quantisation error from compute error on the real artifact --
    see docs/PARITY_RESULTS.md attribution)."""
    import math

    import jax
    import jax.numpy as jnp

    from matrix_eyes_tpu.config import configure_matmul_precision
    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models import fov as fov_mod
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    if dtype == "mixed":
        if quantize_weights is not None:
            raise SystemExit("--quantize-weights does not compose with mixed")
        from matrix_eyes_tpu.ops.mixed import cast_params_mixed

        # mixed semantics: f32 stages at HIGHEST precision, f32 image
        # (dtype flow is input-driven -- config.RuntimeConfig.image_dtype)
        configure_matmul_precision(jnp.float32, True)
        _, params = load_checkpoint(checkpoint, dtype=jnp.float32,
                                    use_caches=False)
        params = cast_params_mixed(params)
        dtype = jnp.float32
    else:
        # f32 on TPU must mean true f32 (multi-pass MXU decomposition),
        # both for the product's reference-grade path and so the weight-
        # quantisation probe isolates weight rounding with exact compute
        configure_matmul_precision(dtype)
        # straight from the .pt: the probe quantifies RUNTIME dtype error,
        # so the weights must be the checkpoint's f32 values cast once to
        # ``dtype``, not the f16 cache convention's values
        _, params = load_checkpoint(checkpoint, dtype=dtype, use_caches=False)
        if quantize_weights is not None:
            params = jax.tree.map(
                lambda a: a.astype(quantize_weights).astype(dtype), params)

    @jax.jit
    def full(p, im):
        canonical, lowres = depth_pro.canonical_inverse_depth(cfg, p, im, use_flash)
        fov_deg = fov_mod.forward(cfg, p["fov"], im, lowres, use_flash)
        fov_deg = fov_deg.astype(jnp.float32)
        f_norm = jnp.tan(0.5 * fov_deg * math.pi / 180.0) / 0.5
        inv = canonical.astype(jnp.float32) / f_norm.reshape(-1, 1, 1)
        return jnp.clip(inv, 1e-4, 1e4), fov_deg, canonical.astype(jnp.float32)

    inv, fov_deg, canonical = full(params, jnp.asarray(img_np, dtype))
    return (np.asarray(inv, np.float32), np.asarray(fov_deg, np.float32),
            np.asarray(canonical, np.float32))


def output_range_err(got_inv, want_inv):
    """Error over the *output* inverse-depth range [1/250, 1/0.1] the user
    actually receives (output.rs clamp); far-field floor noise excluded."""
    lo, hi = 1.0 / 250.0, 1.0 / 0.1
    g = np.clip(np.asarray(got_inv, np.float64), lo, hi)
    w = np.clip(np.asarray(want_inv, np.float64), lo, hi)
    r = np.abs(g - w) / w
    return {"mean_rel": float(r.mean()), "max_rel": float(r.max()),
            "p99_rel": float(np.percentile(r, 99))}


def run_tpu_e2e(args):
    import jax.numpy as jnp

    from matrix_eyes_tpu.pt.loader import load_checkpoint

    dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16, "f32": jnp.float32,
             "mixed": "mixed"}[args.dtype]
    ref_path = os.path.join(args.out_dir, "torch_ref_outputs.npz")
    if not os.path.exists(ref_path):
        raise SystemExit(f"run stages-f32 first (missing {ref_path})")
    ref = np.load(ref_path)

    import jax.numpy as jnp2

    qw = {"none": None, "bf16": jnp2.bfloat16, "f16": jnp2.float16}[
        args.quantize_weights]
    cfg, _ = load_checkpoint(args.checkpoint,
                             dtype=jnp.float32 if dtype == "mixed" else dtype,
                             parts=("head",))
    img_np, _src = load_inputs(args.image, cfg.img_size)
    t0 = time.time()
    inv_j, fov_j, canon_j = _jax_full(cfg, args.checkpoint, img_np, dtype,
                                      use_flash=True, quantize_weights=qw)
    print(f"[jax {args.dtype}] e2e in {time.time()-t0:.0f}s", flush=True)

    mode = f"tpu-e2e-{args.dtype}"
    if qw is not None:
        mode += f"-w{args.quantize_weights}"
    report = {
        "mode": mode,
        "canonical": rel_err(canon_j, ref["canonical"], floor=1e-2),
        "inv_output_range": output_range_err(inv_j, ref["inv"]),
        "inv_raw": rel_err(inv_j, ref["inv"]),
        "fov_deg": {f"jax_{args.dtype}": float(np.asarray(fov_j).ravel()[0]),
                    "torch_f32": float(ref["fov_deg"].ravel()[0])},
        "note": "torch reference computed at f32 on CPU; flash attention on",
    }
    _emit(args, report)


def run_e2e_bf16(args):
    import jax.numpy as jnp

    from matrix_eyes_tpu.pt.loader import load_checkpoint

    ref_path = os.path.join(args.out_dir, "torch_ref_outputs.npz")
    if not os.path.exists(ref_path):
        raise SystemExit(f"run stages-f32 first (missing {ref_path})")
    ref = np.load(ref_path)

    cfg, _ = load_checkpoint(args.checkpoint, dtype=jnp.bfloat16,
                             parts=("head",))  # config only; head is tiny
    img_np, _src = load_inputs(args.image, cfg.img_size)
    t0 = time.time()
    inv_j, fov_j = _jax_e2e(cfg, args.checkpoint, img_np, jnp.bfloat16)
    print(f"[jax bf16] e2e in {time.time()-t0:.0f}s", flush=True)

    report = {
        "mode": "e2e-bf16",
        "e2e_inverse_depth": rel_err(inv_j, ref["inv"]),
        "canonical_note": "torch reference computed at f32 on CPU",
        "fov_deg": {"jax_bf16": float(np.asarray(fov_j).ravel()[0]),
                    "torch_f32": float(ref["fov_deg"].ravel()[0])},
    }
    _emit(args, report)


def run_torch_ref(args):
    """Regenerate ONLY <out-dir>/torch_ref_outputs.npz (the torch mirror's
    f32 canonical/fov/inv on CPU). Use when the saved reference is gone but
    the f32 JAX side is unchanged, so a bf16/f16 policy change can re-run
    tpu-e2e without paying the full stages-f32 pass."""
    import math

    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    import torch_ref
    from matrix_eyes_tpu.pt.loader import load_checkpoint

    cfg, _ = load_checkpoint(args.checkpoint, dtype=np.float32, parts=("head",))
    img_np, _src = load_inputs(args.image, cfg.img_size)

    t0 = time.time()
    flat = {k: torch.from_numpy(np.asarray(v)) for k, v in
            _read_flat(args.checkpoint).items()}
    tm = torch_ref.DepthPro(cfg)
    missing, unexpected = tm.load_state_dict(flat, strict=False)
    if missing:
        raise SystemExit(f"torch mirror missing keys: {missing[:10]}")
    print(f"[torch] loaded ({len(unexpected)} unused ckpt keys) "
          f"in {time.time()-t0:.0f}s", flush=True)
    tm = tm.float().eval()
    del flat

    x = torch.from_numpy(img_np).permute(0, 3, 1, 2)
    t0 = time.time()
    with torch.no_grad():
        encodings = tm.encoder(x)
        features, lowres = tm.decoder(encodings)
        canonical = tm.head(features)[:, 0]
        fov_deg = tm.fov(x, lowres)
        f_norm = torch.tan(0.5 * fov_deg * math.pi / 180.0) / 0.5
        inv = (canonical / f_norm.reshape(-1, 1, 1)).clamp(1e-4, 1e4)
    print(f"[torch] forward in {time.time()-t0:.0f}s", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(args.out_dir, "torch_ref_outputs.npz"),
        canonical=canonical.numpy(), fov_deg=fov_deg.numpy(),
        inv=inv.numpy())
    print(json.dumps({"mode": "torch-ref",
                      "fov_deg": float(fov_deg.numpy().ravel()[0])}))


def _emit(args, report):
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{report['mode']}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["stages-f32", "e2e-bf16", "tpu-e2e",
                                     "torch-ref"])
    ap.add_argument("--dtype", default="bf16",
                    choices=["bf16", "f16", "f32", "mixed"])
    ap.add_argument("--quantize-weights", default="none",
                    choices=["none", "bf16", "f16"],
                    help="tpu-e2e only: round-trip weights through this "
                         "dtype before running (isolates weight-rounding "
                         "error from compute error)")
    ap.add_argument("--checkpoint", default="/tmp/ckpt_full/depth_pro.pt")
    ap.add_argument("--image", default="/tmp/ckpt_full/photo.jpg")
    ap.add_argument("--out-dir", default="/tmp/parity")
    args = ap.parse_args()
    if args.mode == "stages-f32":
        run_stages_f32(args)
    elif args.mode == "tpu-e2e":
        run_tpu_e2e(args)
    elif args.mode == "torch-ref":
        run_torch_ref(args)
    else:
        run_e2e_bf16(args)


if __name__ == "__main__":
    main()
