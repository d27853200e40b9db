"""Compile-only validation of the PRODUCTION-scale sharded forward.

The multi-chip numerics are executed at TINY/MID scale (cheap enough to
run on the virtual CPU mesh); what those legs cannot show is which
partitioning GSPMD actually picks at production dimensions (1536^2 input,
1024-dim ViT-L, 35->36-padded patch axis) -- the thing docs/SCALING.md's
near-linear projection rests on. This module lowers + compiles the REAL
DEPTH_PRO forward over a mesh with fully abstract inputs
(jax.ShapeDtypeStruct + NamedSharding: no 3.8 GB of host parameters, no
execution) and asserts the compiled HLO keeps the layout's promises:

* the pyramid patch axis (encoder.rs:142-156's split axis) stays sharded
  per-device -- the padded 36-patch batch appears as 36/data tiles;
* TP all-reduces exist (row-parallel proj/fc2 sums) and a patch-merge
  redistribution collective exists;
* NO token-shaped all-gather: the head-group qkv layout keeps attention
  head-local per shard (parallel/sharding._tp_permute_qkv), so the legacy
  per-block qkv gathers must not reappear;

and reports the collective set with byte counts, so the ICI budget cited
in docs/SCALING.md is read off the production executable rather than
extrapolated from MID.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from matrix_eyes_tpu.config import ModelConfig

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1}
_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter")


def abstract_sharded_params(cfg: ModelConfig, mesh) -> Dict[str, Any]:
    """The TP-layout parameter tree as sharded ShapeDtypeStructs: the
    head-group qkv permutation applied abstractly (jax.eval_shape over
    _tp_permute_qkv), then each leaf annotated with its shard_params
    placement -- byte-free stand-ins for a 1.9 GB checkpoint."""
    from matrix_eyes_tpu.models.spec import param_spec
    from matrix_eyes_tpu.parallel.sharding import _tp_permute_qkv, param_specs

    model_axes = [s for n, s in mesh.shape.items() if n != "data" and s > 1]
    k = model_axes[0] if len(model_axes) == 1 else 1

    def permute(p):
        if isinstance(p, dict):
            if "qkv_w" in p or "qkv_qw" in p:
                return _tp_permute_qkv(p, k)
            return {key: permute(v) for key, v in p.items()}
        return p

    spec = param_spec(cfg)
    if k > 1 and cfg.num_heads % k == 0:
        spec = jax.eval_shape(permute, spec)
    pspecs = param_specs(spec)
    return jax.tree.map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        spec, pspecs)


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, float]]:
    """{op_kind: {count, bytes}} over the compiled module: each collective
    instruction's result shape, decoded to bytes."""
    stats: Dict[str, Dict[str, float]] = {}
    shape_re = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
    for line in hlo_text.splitlines():
        for op in _COLLECTIVES:
            if f" {op}(" in line or f" {op}-start(" in line:
                m = shape_re.search(line)
                nbytes = 0
                if m and m.group(1) in _DTYPE_BYTES:
                    n = 1
                    for d in m.group(2).split(","):
                        if d:
                            n *= int(d)
                    nbytes = n * _DTYPE_BYTES[m.group(1)]
                s = stats.setdefault(op, {"count": 0, "bytes": 0})
                s["count"] += 1
                s["bytes"] += nbytes
                break
    return stats


def compile_production_forward(cfg: ModelConfig, mesh,
                               batch: int = 1) -> Dict[str, Any]:
    """Lower + compile the sharded production forward (FOV head included)
    with abstract inputs; assert the layout invariants; return the report
    (collective stats + patch-axis evidence). Raises AssertionError on any
    broken invariant."""
    from matrix_eyes_tpu.models import depth_pro
    from matrix_eyes_tpu.parallel.sharding import patch_sharded

    params = abstract_sharded_params(cfg, mesh)
    img = jax.ShapeDtypeStruct(
        (batch, cfg.img_size, cfg.img_size, 3), jnp.float32,
        sharding=NamedSharding(mesh, P()))

    def fwd(p, im):
        return depth_pro.forward_with_fov.__wrapped__(cfg, p, im, False)

    with patch_sharded(mesh):
        compiled = jax.jit(fwd).lower(params, img).compile()
    txt = compiled.as_text()

    from matrix_eyes_tpu.flops import _split_tiles

    data = mesh.shape["data"]
    model_axes = [s for n, s in mesh.shape.items() if n != "data" and s > 1]
    k = model_axes[0] if model_axes else 1
    n_patches = (_split_tiles(cfg.img_size, cfg.vit_img_size, 4) ** 2
                 + _split_tiles(cfg.img_size // 2, cfg.vit_img_size, 2) ** 2
                 + 1)  # encoder.rs:238-250 (35 for production)
    padded = -(-n_patches * batch // data) * data
    per_dev = padded // data
    S = cfg.vit_img_size
    assert f"[{per_dev},{S},{S},3]" in txt, \
        "patch axis is not sharded per-device at production scale"
    if data > 1:
        # a data=1 mesh legitimately keeps the full pyramid on one shard
        assert f"[{padded},{S},{S},3]" not in txt, \
            "unsharded full pyramid found in the production HLO"
        assert any(c in txt for c in ("all-to-all", "all-gather",
                                      "collective-permute")), \
            "expected a patch-merge redistribution collective"
    if k > 1:
        assert "all-reduce" in txt, "expected TP all-reduces"
    # head-local attention: no collective may gather a token-axis activation
    tokens = str(cfg.num_patch_tokens + 1)
    shape_re = re.compile(r"[a-z0-9]+\[([\d,]*)\]")
    for line in txt.splitlines():
        if "all-gather(" in line or "all-gather-start(" in line:
            m = shape_re.search(line)
            assert not (m and tokens in m.group(1).split(",")), \
                f"qkv-shaped all-gather found: {line.strip()}"

    stats = collective_stats(txt)
    return {
        "mesh": dict(mesh.shape),
        "patches_per_device": per_dev,
        "collectives": stats,
        "collective_mbytes_total": round(
            sum(s["bytes"] for s in stats.values()) / 1e6, 2),
    }
