"""Sharding layouts for multi-chip Depth Pro inference.

Two mesh axes:

* ``data``: the patch/batch axis. The encoder's 35-patch pyramid batch
  (25 + 9 + 1 per image) is annotated with a ``data`` sharding constraint;
  every patch is an independent ViT forward until the overlap merge, where
  XLA all-gathers the patch features (SURVEY.md section 5: the natural
  sharding axis; BASELINE config 5). Multi-image throughput batches shard
  the same way.
* ``model``: Megatron-style tensor parallelism inside every ViT block --
  qkv and fc1 column-sharded, proj and fc2 row-sharded, so each block costs
  one all-reduce pair and attention heads stay local to a chip.

The model functions themselves stay sharding-agnostic: the pyramid
constraint is injected through a context variable (set by
``patch_sharded``), and parameter shardings are applied with ``device_put``
before jit, letting GSPMD propagate everything else.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_patch_ctx: contextvars.ContextVar = contextvars.ContextVar("me_patch_sharding", default=None)


def make_mesh(n_devices: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (data, model) over the first n devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n % model != 0:
        raise ValueError(f"n_devices {n} not divisible by model-parallel size {model}")
    arr = np.asarray(devices[:n]).reshape(n // model, model)
    return Mesh(arr, ("data", "model"))


@contextlib.contextmanager
def patch_sharded(mesh: Mesh, axis: str = "data"):
    """Within this context, the encoder annotates its pyramid patch batch
    with a sharding constraint over ``axis``."""
    token = _patch_ctx.set((mesh, axis))
    try:
        yield
    finally:
        _patch_ctx.reset(token)


def shard_patches(x):
    """Shard the pyramid patch batch over the 'data' axis (no-op outside a
    ``patch_sharded`` context). Called from models.encoder on the
    (35*B, P, P, 3) batch; returns (possibly padded) batch + original count.

    35 patches don't divide an 8-chip axis, so the batch is zero-padded to
    the next multiple (35 -> 40: 5 patches per chip, SURVEY.md section 5);
    the padding rides through the batch-independent ViT and is sliced off
    by the caller before the merge.
    """
    ctx = _patch_ctx.get()
    n = x.shape[0]
    if ctx is None:
        return x, n
    mesh, axis = ctx
    size = mesh.shape[axis]
    padded = (n + size - 1) // size * size
    if padded != n:
        pad_widths = [(0, padded - n)] + [(0, 0)] * (x.ndim - 1)
        x = jax.numpy.pad(x, pad_widths)
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec)), n


def active_patch_context():
    """The (mesh, axis) of the enclosing ``patch_sharded`` context, or
    None outside one."""
    return _patch_ctx.get()


def active_model_parallel():
    """(mesh, data_axis, model_axis, k) when the enclosing ``patch_sharded``
    mesh carries exactly one non-data axis of size k > 1, else None."""
    ctx = _patch_ctx.get()
    if ctx is None:
        return None
    mesh, axis = ctx
    others = [(n, s) for n, s in mesh.shape.items() if n != axis and s > 1]
    if len(others) != 1:
        return None
    return mesh, axis, others[0][0], others[0][1]


# qkv keys whose LAST axis spans the [q|k|v] output features, and their
# head-group-major renames. Covers both the float layout (qkv_w) and the
# int8-quantized one (qkv_qw int8 weights + qkv_sw per-output-channel
# scales -- the scales follow their columns through the permutation).
_TP_QKV_RENAMES = {"qkv_w": "qkv_gw", "qkv_b": "qkv_gb",
                   "qkv_qw": "qkv_gqw", "qkv_sw": "qkv_gsw"}


def _tp_permute_qkv(blocks: Dict[str, Any], k: int) -> Dict[str, Any]:
    """Permute stacked-block qkv columns from [q|k|v] (heads contiguous in
    each section) to head-group-major [q_0|k_0|v_0|...|q_{k-1}|k_{k-1}|v_{k-1}],
    renaming the keys to ``qkv_gw``/``qkv_gb`` (``qkv_gqw``/``qkv_gsw``/
    ``qkv_gb`` for the int8-quantized layout).

    Under Megatron TP the qkv weight's output axis is GSPMD-sharded in
    contiguous chunks; in the checkpoint's [q|k|v] layout those chunks mix
    sections (device 0 would get all of q plus part of k). Head-group-major
    order makes each model-axis shard hold the complete q/k/v of its own
    head group -- exactly the layout the fused attention kernel expects per
    shard, with zero extra collectives, and group-major head order equals
    standard head order so the attention output feeds the row-sharded proj
    unchanged. The rename makes the layout self-describing: the forward
    path dispatches on the key (models/vit.py), so permuted parameters can
    never be silently misread as checkpoint-layout ones (jax interns equal
    Mesh objects, so a mesh-keyed registry could not provide that
    guarantee). The PERMUTATION DEGREE is self-describing too: ``qkv_gb``
    is stored grouped, shape (..., k, 3C/k), so the forward path can check
    the active mesh's model-axis size against the k the columns were
    actually permuted for -- a layout permuted for k=4 run under a k=2 mesh
    would otherwise mix sections across head groups silently."""
    ref = blocks["qkv_qw"] if "qkv_qw" in blocks else blocks["qkv_w"]
    c3 = ref.shape[-1]
    c = c3 // 3
    per = c // k
    idx = np.concatenate([
        np.concatenate([sec * c + g * per + np.arange(per) for sec in range(3)])
        for g in range(k)
    ])
    out = {key: v for key, v in blocks.items() if key not in _TP_QKV_RENAMES}
    for src, dst in _TP_QKV_RENAMES.items():
        if src in blocks:
            out[dst] = blocks[src][..., idx]
    out["qkv_gb"] = out["qkv_gb"].reshape(out["qkv_gb"].shape[:-1] + (k, c3 // k))
    return out


def active_data_mesh():
    """(mesh, axis) of the enclosing ``patch_sharded`` context when the
    mesh is pure data-parallel (model axis of size 1), else None.

    Used by the ViT to run the Pallas attention kernel per-shard under
    ``shard_map``: a pallas_call is opaque to the GSPMD partitioner, so
    inside a sharded computation it must be explicitly mapped over its
    shards. With tensor parallelism (model > 1) the qkv features are
    sharded mid-head-section, so those runs keep the XLA attention."""
    ctx = _patch_ctx.get()
    if ctx is None:
        return None
    mesh, axis = ctx
    if any(size > 1 for name, size in mesh.shape.items() if name != axis):
        return None
    return mesh, axis


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a leading-batch array sharded over ``axis`` (replicated if the
    batch doesn't divide the axis -- the pyramid patch axis still shards)."""
    if x.shape[0] % mesh.shape[axis] == 0:
        spec = P(axis, *([None] * (x.ndim - 1)))
    else:
        spec = P()
    return jax.device_put(x, NamedSharding(mesh, spec))


def _vit_block_specs() -> Dict[str, P]:
    # Stacked block params have a leading layer axis (never sharded).
    # qkv_gw/qkv_gb are the head-group-permuted qkv (see _tp_permute_qkv);
    # same sharding, different column order.
    return {
        "qkv_w": P(None, None, "model"),
        "qkv_b": P(None, "model"),
        "qkv_gw": P(None, None, "model"),
        # grouped bias: (L, k, 3C/k) -- the group axis IS the shard axis,
        # and its extent doubles as the recorded permutation degree
        "qkv_gb": P(None, "model", None),
        "proj_w": P(None, "model", None),
        "fc1_w": P(None, None, "model"),
        "fc1_b": P(None, "model"),
        "fc2_w": P(None, "model", None),
        # int8-quantized layout (ops/quant.py): int8 weights shard exactly
        # like their float counterparts; per-output-channel scales shard
        # with the OUTPUT axis, so column-parallel scales are model-sharded
        # while row-parallel ones (proj/fc2 shard their input axis) stay
        # replicated.
        "qkv_qw": P(None, None, "model"),
        "qkv_sw": P(None, "model"),
        "qkv_gqw": P(None, None, "model"),
        "qkv_gsw": P(None, "model"),
        "proj_qw": P(None, "model", None),
        "proj_sw": P(),
        "fc1_qw": P(None, None, "model"),
        "fc1_sw": P(None, "model"),
        "fc2_qw": P(None, "model", None),
        "fc2_sw": P(),
    }


def _vit_specs(vit_params: Dict[str, Any]) -> Dict[str, Any]:
    block_specs = _vit_block_specs()
    return {
        "patch_embed": {k: P() for k in vit_params["patch_embed"]},
        "cls_token": P(),
        "pos_embed": P(),
        "blocks": {k: block_specs.get(k, P()) for k in vit_params["blocks"]},
        "norm": {k: P() for k in vit_params["norm"]},
    }


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree: ViT blocks tensor-parallel, everything else
    replicated (the conv decoder/head are a tiny fraction of the FLOPs)."""

    def walk(p, path=()):
        if isinstance(p, dict):
            if any(k in p for k in ("qkv_w", "qkv_gw", "qkv_qw", "qkv_gqw")):  # stacked vit blocks
                block_specs = _vit_block_specs()
                return {k: block_specs.get(k, P()) for k in p}
            return {k: walk(v, path + (k,)) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(walk(v, path) for v in p)
        return P()

    return walk(params)


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 num_heads: Optional[int] = None) -> Dict[str, Any]:
    """device_put the parameter tree with TP shardings over ``mesh``.

    When the mesh has a model axis of size k > 1 and ``num_heads`` (the
    ViTs' head count, divisible by k) is given, the qkv parameters are
    permuted to the head-group-major TP layout (see _tp_permute_qkv) and the
    layout is registered for this mesh; the forward path then runs
    attention head-locally per shard -- through the fused Pallas kernel
    where the geometry allows -- with no extra collectives. Without
    ``num_heads`` the layout stays as in the checkpoint and TP falls back
    to GSPMD-resharded XLA attention (correct, slower).
    """
    model_axes = [s for n, s in mesh.shape.items() if n != "data" and s > 1]
    k = model_axes[0] if len(model_axes) == 1 else 1
    if k > 1 and num_heads is not None and num_heads % k == 0:
        def permute(p):
            if isinstance(p, dict):
                if "qkv_w" in p or "qkv_qw" in p:
                    return _tp_permute_qkv(p, k)
                return {key: permute(v) for key, v in p.items()}
            return p

        params = permute(params)

    specs = param_specs(params)

    def place(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)
