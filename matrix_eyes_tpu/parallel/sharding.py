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
    return {
        "qkv_w": P(None, None, "model"),
        "qkv_b": P(None, "model"),
        "proj_w": P(None, "model", None),
        "fc1_w": P(None, None, "model"),
        "fc1_b": P(None, "model"),
        "fc2_w": P(None, "model", None),
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
            if "qkv_w" in p:  # stacked vit blocks
                block_specs = _vit_block_specs()
                return {k: block_specs.get(k, P()) for k in p}
            return {k: walk(v, path + (k,)) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(walk(v, path) for v in p)
        return P()

    return walk(params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the parameter tree with TP shardings over ``mesh``."""
    specs = param_specs(params)

    def place(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)
