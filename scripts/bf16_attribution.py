"""Per-stage bf16 error attribution at production scale (round-3 task:
shrink the canonical tail p99 5.8% -> <=2%).

Compares the bf16 pipeline against the f32 pipeline on the SAME random
full-size weights (seeded init_params), stage by stage, then probes hybrid
precision policies (selected stages promoted to f32) to find the cheapest
stage whose promotion fixes the canonical tail.

Run on the TPU:  PYTHONPATH=. python scripts/bf16_attribution.py [probe ...]
Probes: none | head | decoder | dec_head | dec_last
Emits one JSON line per result.

Round-4 adds WEIGHT-GROUP probes (the judge's mixed-weight-precision
question: which weights' bf16 rounding owns the p99 tail, and what would
keeping them f32 buy per MB?). Spec: ``w:only:<sel>`` rounds ONLY the
selected weight group to bf16 (rest stays f32) -- the group's direct
error contribution; ``w:keep:<sel>`` rounds everything EXCEPT it -- what
a shipping mixed mode that protects the group would still suffer. All
weight probes run the SAME compiled f32-activation program (weights are
values, not shapes), so after the first compile each probe is one
forward. Selectors: blockmm qkv proj fc1 fc2 attn mlp blockvec embed
nonvit patchvit imagevit fovvit blocksA-B (stacked-depth row range over
every ViT). A `w:` probe reports the rounded/kept parameter counts and
the extra MiB a mixed bf16 mode would spend holding the kept group f32.
``--precision=default|highest`` (default highest) sets the f32 programs'
MXU dot precision -- see the inline note; round-3 tables ran DEFAULT.

By default the weights are seeded random at production scale (this
sandbox's .pt is a random fixture anyway, docs/PARITY_RESULTS.md). With
trained weights available, pass ``--checkpoint=<path.pt>`` (loads the
checkpoint's own f32 values, bypassing the f16 cache convention) and
optionally ``--image=<photo.jpg>`` to probe on a real photograph --
docs/TRAINED_WEIGHTS_RUNBOOK.md step 5.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def rel_stats(got, want, floor=1e-2):
    g = np.asarray(got, np.float64)
    w = np.asarray(want, np.float64)
    r = np.abs(g - w) / np.maximum(np.abs(w), floor)
    return {"mean_rel": float(r.mean()), "p99_rel": float(np.percentile(r, 99)),
            "max_rel": float(r.max())}


def main():
    from matrix_eyes_tpu.config import DEPTH_PRO, enable_compilation_cache
    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.models import fov as fov_mod
    from matrix_eyes_tpu.models.init import init_params

    enable_compilation_cache()
    ckpt = image = None
    cfg_name = "depth_pro"
    precision = "highest"
    probes_argv = []
    for a in sys.argv[1:]:
        if a.startswith("--checkpoint="):
            ckpt = a.split("=", 1)[1]
        elif a.startswith("--image="):
            image = a.split("=", 1)[1]
        elif a.startswith("--config="):
            cfg_name = a.split("=", 1)[1]  # tiny = CPU smoke of the harness
        elif a.startswith("--precision="):
            precision = a.split("=", 1)[1]
        else:
            probes_argv.append(a)

    # Matmul precision of the f32 programs (reference, a32, w: probes).
    # "highest" (default since round 4) = true-f32 MXU dots, so a rounded
    # weight group's error is ITS quantisation and nothing else -- the same
    # semantics the shipping --dtype f32 path configures. NOTE the round-3
    # tables in docs/PARITY_RESULTS.md predate this flag and ran DEFAULT,
    # where XLA rounds f32 dot inputs to bf16 on the MXU: their reference
    # already carried bf16 matmul weights, so those rows isolate the
    # VECTOR-path weight uses (embeddings, norms, biases, LayerScale),
    # not MXU weight rounding. bf16-input dots ignore this setting, so the
    # hybrid activation probes are unaffected either way.
    if precision not in ("default", "highest"):
        raise SystemExit(f"--precision must be default|highest: {precision}")
    if precision == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")

    t0 = time.time()
    if ckpt:
        from matrix_eyes_tpu.pt.loader import load_checkpoint

        # use_caches=False: probe the checkpoint's own f32 values, not the
        # f16 on-disk cache convention (same policy as scripts/parity_real)
        cfg, params32 = load_checkpoint(ckpt, dtype=jnp.float32,
                                        use_caches=False)
    else:
        from matrix_eyes_tpu.config import TINY

        cfg = TINY if cfg_name == "tiny" else DEPTH_PRO
        params32 = init_params(cfg, seed=7)
    params32 = jax.block_until_ready(params32)
    print(f"init {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    if image:
        from matrix_eyes_tpu.io.image import load_source_image
        from matrix_eyes_tpu.pipeline import preprocess_image

        src = load_source_image(image, None)
        img = preprocess_image(jnp.asarray(src.rgb), cfg.img_size,
                               jnp.float32)
    else:
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.uniform(-1, 1, (1, cfg.img_size, cfg.img_size, 3))
                          .astype(np.float32))

    def run(params, dtype, use_flash):
        @jax.jit
        def full(p, im):
            canonical, lowres = depth_pro.canonical_inverse_depth(
                cfg, p, im, use_flash)
            fov_deg = fov_mod.forward(cfg, p["fov"], im, lowres, use_flash)
            return canonical.astype(jnp.float32), fov_deg.astype(jnp.float32)

        canon, fov = full(params, img.astype(dtype))
        return np.asarray(canon), np.asarray(fov)

    # ONE jitted f32 program shared by the reference and every weight-group
    # probe: selective rounding changes parameter VALUES only, so the first
    # call pays the (remote) compile and every further probe is one forward.
    @jax.jit
    def _full32(p, im):
        canonical, lowres = depth_pro.canonical_inverse_depth(
            cfg, p, im, False)
        fov_deg = fov_mod.forward(cfg, p["fov"], im, lowres, False)
        return canonical.astype(jnp.float32), fov_deg.astype(jnp.float32)

    img32 = img.astype(jnp.float32)

    def run32(params):
        canon, fov = _full32(params, img32)
        return np.asarray(canon), np.asarray(fov)

    # The f32 reference costs ~10 min of remote compile; cache it on disk
    # across probe invocations (keyed by the weight/image source).
    if ckpt or image or cfg_name != "depth_pro" or precision != "default":
        import hashlib

        tag = hashlib.sha1(
            f"{ckpt or 'seed7'}|{image or 'rand3'}|{cfg_name}|{precision}"
            .encode()).hexdigest()[:10]
        ref_path = f"/tmp/bf16_attr_ref_{tag}.npz"
    else:
        ref_path = "/tmp/bf16_attr_ref_s7_i3.npz"
    if os.path.exists(ref_path):
        with np.load(ref_path) as z:
            canon32, fov32 = z["canon"], z["fov"]
        print("f32 reference loaded from cache", file=sys.stderr, flush=True)
    else:
        canon32, fov32 = run32(params32)
        np.savez(ref_path, canon=canon32, fov=fov32)
        print("f32 reference done", file=sys.stderr, flush=True)

    from matrix_eyes_tpu.models import decoder as decoder_mod
    from matrix_eyes_tpu.models import encoder as encoder_mod
    from matrix_eyes_tpu.models import head as head_mod
    from matrix_eyes_tpu.ops import nn

    cast16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)

    def hybrid_decoder(dp32, dp16, encodings, f32_levels):
        """decoder_mod.forward with per-fusion-level precision: level i
        (0 = finest 768^2 ... 4 = coarsest 48^2) runs in f32 when
        i in f32_levels, else bf16 (activations cast at each level
        boundary, weights from the matching tree)."""
        n = len(encodings)

        def pick(i):
            f32 = i in f32_levels
            dp = dp32 if f32 else dp16
            return (jnp.float32 if f32 else jnp.bfloat16), dp["convs"], dp["fusions"]

        i = n - 1
        dt, convs, fusions = pick(i)
        features = nn.conv2d(encodings[-1].astype(dt), convs[-1]["w"], padding=1)
        lowres = features
        features = decoder_mod.feature_fusion_block(fusions[-1], features, None)
        skip = 0 if len(convs) == len(fusions) else 1
        for i in range(n - 2, -1, -1):
            dt, convs, fusions = pick(i)
            features = features.astype(dt)
            enc = encodings[i].astype(dt)
            if i - skip >= 0:
                proj = convs[i - skip]
                enc = (nn.linear(enc, proj["w"]) if proj["w"].ndim == 2
                       else nn.conv2d(enc, proj["w"], padding=1))
            features = decoder_mod.feature_fusion_block(fusions[i], features, enc)
        return features, lowres

    # probe -> (decoder f32 levels, head f32)
    PROBES = {
        "none": (frozenset(), False),
        "head": (frozenset(), True),
        "decoder": (frozenset(range(5)), False),
        "dec_head": (frozenset(range(5)), True),
        "dec_fine": (frozenset({0}), True),       # finest fusion + head
        "dec_coarse": (frozenset({1, 2, 3, 4}), True),
        "dec_fine_only": (frozenset({0}), False),
    }

    def run_hybrid(probe):
        """Full bf16 pipeline with selected stages promoted to f32
        (activations cast at the stage boundary, f32 weights -- the
        models/fov.py policy applied to other stages)."""
        f32_levels, f32_head = PROBES[probe]

        @jax.jit
        def full(p32, p16, im):
            encodings = encoder_mod.forward_encodings(
                cfg, p16["encoder"], im, True)
            features, lowres = hybrid_decoder(
                p32["decoder"], p16["decoder"], encodings, f32_levels)
            features = features.astype(jnp.float32 if f32_head else jnp.bfloat16)
            canonical = head_mod.forward(
                p32["head"] if f32_head else p16["head"], features)[..., 0]
            fov_deg = fov_mod.forward(cfg, p16["fov"], im,
                                      lowres.astype(jnp.bfloat16), True)
            return canonical.astype(jnp.float32), fov_deg.astype(jnp.float32)

        canon, fov = full(params32, cast16, img.astype(jnp.bfloat16))
        return np.asarray(canon), np.asarray(fov)

    # ---- weight-group probes (w:only:<sel> / w:keep:<sel>) ----------------
    # Selective bf16 rounding of weight VALUES, evaluated through the shared
    # f32-activation program (_full32): the measured error is the group's
    # rounding and nothing else. `only` rounds just the group (its direct
    # contribution); `keep` rounds everything else (what a shipping mixed
    # mode that protects the group would still suffer). blocksA-B selects a
    # half-open depth-row range [A, B) of every ViT's stacked block leaves.
    import re

    _VIT_MM = ("['qkv_w']", "['proj_w']", "['fc1_w']", "['fc2_w']")
    _LEAFSETS = {
        "qkv": ("['qkv_w']",), "proj": ("['proj_w']",),
        "fc1": ("['fc1_w']",), "fc2": ("['fc2_w']",),
        "attn": ("['qkv_w']", "['proj_w']"),
        "mlp": ("['fc1_w']", "['fc2_w']"),
        "blockmm": _VIT_MM,
    }
    _VITS = ("patch_encoder", "image_encoder", "['fov']['encoder']")

    def make_selector(sel):
        """-> (pred(path_str) -> bool, depth_row_range or None).
        '+' unions plain selectors (e.g. nonvit+embed); not with blocksA-B."""
        if "+" in sel:
            parts = [make_selector(p) for p in sel.split("+")]
            if any(rows is not None for _, rows in parts):
                raise SystemExit("blocksA-B cannot be unioned")
            preds = [p for p, _ in parts]
            return (lambda s: any(p(s) for p in preds)), None
        m = re.fullmatch(r"blocks(\d+)-(\d+)", sel)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
            return (lambda s: "['blocks']" in s), (lo, hi)
        if sel in _LEAFSETS:
            names = _LEAFSETS[sel]
            return (lambda s: "['blocks']" in s
                    and any(n in s for n in names)), None
        if sel == "blockvec":  # norms, layerscales, biases inside blocks
            return (lambda s: "['blocks']" in s
                    and not any(n in s for n in _VIT_MM)), None
        if sel == "embed":  # patch/pos embeddings, cls token, final norm
            names = ("patch_embed", "pos_embed", "cls_token", "['norm']")
            return (lambda s: any(n in s for n in names)), None
        if sel == "nonvit":  # decoder, head, fov convs, encoder fuse/upsample
            return (lambda s: not any(v in s for v in _VITS)), None
        if sel == "decoder":
            return (lambda s: s.startswith("['decoder']")), None
        if sel == "head":
            return (lambda s: s.startswith("['head']")), None
        if sel == "fovhead":  # the FOV net's convs/linear, not its ViT
            return (lambda s: s.startswith("['fov']")
                    and "['fov']['encoder']" not in s), None
        if sel == "encglue":  # encoder upsamples + lowres fuse (non-ViT)
            return (lambda s: s.startswith("['encoder']")
                    and not any(v in s for v in _VITS)), None
        if sel == "patchvit":
            return (lambda s: "patch_encoder" in s), None
        if sel == "imagevit":
            return (lambda s: "image_encoder" in s), None
        if sel == "fovvit":
            return (lambda s: "['fov']['encoder']" in s), None
        raise SystemExit(f"unknown weight selector {sel}")

    def _round16(a):
        return a.astype(jnp.bfloat16).astype(jnp.float32)

    def selective_round(pred, rows, mode):
        """Round group members ('only') or non-members ('keep') of params32
        to bf16-and-back; returns (params, {rounded, kept} param counts)."""
        stats = {"rounded": 0, "kept": 0}

        def f(path, a):
            s = jax.tree_util.keystr(path)
            member = pred(s)
            if rows is not None and member:
                lo = max(0, min(rows[0], a.shape[0]))
                hi = max(lo, min(rows[1], a.shape[0]))
                n_in = (hi - lo) * (a.size // a.shape[0])
                if mode == "only":
                    out = a.at[lo:hi].set(_round16(a[lo:hi]))
                    stats["rounded"] += n_in
                    stats["kept"] += a.size - n_in
                else:
                    out = _round16(a).at[lo:hi].set(a[lo:hi])
                    stats["rounded"] += a.size - n_in
                    stats["kept"] += n_in
                return out
            do_round = member if mode == "only" else not member
            if do_round:
                stats["rounded"] += a.size
                return _round16(a)
            stats["kept"] += a.size
            return a

        return jax.tree_util.tree_map_with_path(f, params32), stats

    def run_weight_probe(spec):
        _, mode, sel = spec.split(":", 2)
        if mode not in ("only", "keep"):
            raise SystemExit(f"weight probe mode must be only|keep: {spec}")
        pred, rows = make_selector(sel)
        params, stats = selective_round(pred, rows, mode)
        canon, fov = run32(params)
        group = stats["rounded"] if mode == "only" else stats["kept"]
        extra = {
            "rounded_params": stats["rounded"],
            "kept_params": stats["kept"],
            "group_params": group,
            # what holding the group f32 (vs bf16) costs a mixed mode
            "group_f32_extra_mib": round(group * 2 / 2**20, 2),
        }
        return canon, fov, extra

    def run_special(probe):
        """Decomposition probes separating error SOURCES (not stages):

        a32      f32 activations everywhere but weights carry bf16
                 rounding (cast f32->bf16->f32): the share of the error
                 due to WEIGHT quantisation alone.
        noflash  plain bf16 pipeline with XLA attention instead of the
                 Pallas flash kernel: the kernel's own contribution
                 (exp2 softmax etc.) -- the f32 reference is flash-off.
        int8     the opt-in --dtype int8 layout (ops/quant.py): ViT block
                 weights int8 per-channel, qkv/proj/fc1 activations
                 per-token int8 on the MXU, everything else bf16.
        mixed    the opt-in --dtype mixed layout (ops/mixed.py): ViT block
                 matmul weights bf16 + flash kernel, f32 image so every
                 other stage runs f32 (input-driven dtype flow) -- the
                 REAL shipping config, activations included.
        """
        if probe == "mixed":
            from matrix_eyes_tpu.ops.mixed import cast_params_mixed

            return run(cast_params_mixed(params32), jnp.float32,
                       use_flash=jax.default_backend() == "tpu")
        if probe == "a32":
            # all weights bf16-rounded, f32 activations -- through the same
            # compiled program as the w: probes (one forward, no recompile)
            p = jax.tree.map(lambda a: a.astype(jnp.float32), cast16)
            return run32(p)
        if probe == "noflash":
            return run(cast16, jnp.bfloat16, use_flash=False)
        if probe == "int8":
            from matrix_eyes_tpu.ops.quant import quantize_params_device

            return run(quantize_params_device(cast16), jnp.bfloat16,
                       use_flash=True)
        raise SystemExit(f"unknown probe {probe}")

    probes = probes_argv or ["none", "head", "decoder", "dec_head"]
    for probe in probes:
        t0 = time.time()
        extra = {}
        if probe.startswith("w:"):
            canon, fov, extra = run_weight_probe(probe)
        elif probe in PROBES:
            canon, fov = run_hybrid(probe)
        else:
            canon, fov = run_special(probe)
        dt = time.time() - t0
        print(json.dumps({
            "probe": probe,
            "canonical": rel_stats(canon, canon32),
            "fov_abs_err": float(np.abs(fov - fov32).max()),
            "wall_s_first_call": round(dt, 1),
            **extra,
        }), flush=True)


if __name__ == "__main__":
    main()
