"""Int8 quantized linear layers for the opt-in ``--dtype int8`` mode.

The v5e MXU runs int8 x int8 -> int32 matmuls at ~2x its bf16 rate
(measured on-chip: 294-390 TFLOP/s vs 180-200 at the ViT's shapes, see
docs/PERFORMANCE.md round-3 int8 section), and int8 parameters halve both
HBM weight traffic and the host->device upload. The reference has no
quantized path (Burn f32/f16/bf16 only, reconstruction.rs:15-20); this is
a TPU-native extension, opt-in because it trades accuracy for speed
beyond the BASELINE <1% contract.

Scheme (standard post-training dynamic quantization):

* weights: symmetric per-output-channel. ``scale_j = max_i |w_ij| / 127``;
  stored int8 alongside an f32 scale vector. Quantized once on the host at
  load time (pt/loader.py), so the device upload is the int8 blob.
* activations: symmetric per-token (per matmul row), computed dynamically
  on device -- one abs-max reduce over the feature axis per call. Per-token
  beats per-tensor materially on accuracy and the dequant outer product
  ``row_scale x col_scale`` fuses into the int32->f32 epilogue for free.
* accumulation: int32 on the MXU (``preferred_element_type``), dequantized
  straight to f32, bias added in f32, cast back to the activation dtype.

Only plain (in, out) matmul layers use this path -- the ViT's qkv / proj /
fc1 / fc2, where the model's FLOPs live. LayerNorm, softmax/attention,
GELU, convolutions and every decoder/head op stay in the runtime compute
dtype: their cost is bandwidth, not MXU rate, so int8 buys nothing there.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_QMAX = 127.0

# Which ViT block matmuls run int8 on the MXU vs. only *store* int8 (the
# weight dequantized to the compute dtype inside the scan body). All
# numbers measured on a v5e at the patch encoder's production shape
# (35 x 640 tokens; scripts/profile_int8.py + docs/PERFORMANCE.md round-3
# int8 section). The honest findings, in order of hard-won-ness:
#
# 1. ISOLATED matmul probes flatter int8 (+0.65 ms/block): their checksum
#    fuses into the dot epilogue and elides the output write, and the
#    dynamic per-token quantization's two extra HBM passes over the
#    activation are cheap relative to a bare matmul.
# 2. COMPOSED in a full transformer block, those quant passes sit on the
#    critical path: a full 24-block chain measured int8 within +-1% of
#    bf16 (scan24: 94.2 ms float vs 95.0-95.3 int8). Int8 COMPUTE is
#    performance-neutral end-to-end on this model.
# 3. The fix that would recover the MXU gain -- quantize in-kernel inside a
#    Pallas matmul (zero extra HBM traffic) -- is dead on this toolchain:
#    Mosaic lowers int8 dots at ~138 TFLOP/s (slower than its bf16 dot),
#    while XLA's int8 dot hits ~350 TFLOP/s but needs int8 operands in HBM.
#
# The mode's real value is therefore MEMORY: every ViT block weight stored
# int8 halves the checkpoint's HBM residency and host->device upload
# (1.9 GB -> ~1.0 GB). Config chosen by block-level measurement
# (block: float 4.06 ms | qkv,fc1 compute + proj,fc2 weight-only 3.84 |
# all-weight-only 4.20 -- the extra dequant passes on qkv/fc1 cost more
# than keeping their activations quantized):
QUANT_COMPUTE = ("qkv", "fc1")
QUANT_WEIGHT_ONLY = ("proj", "fc2")


def quantize_weight(w, *, contract_axis: int = -2):
    """Symmetric per-output-channel int8 quantization of a weight tensor.

    ``w`` is (..., in, out) (the nn.linear layout); the scale is the abs-max
    over the contraction (``in``) axis, one per output channel, so each
    output column keeps its own dynamic range. Returns (int8 weights,
    f32 scales broadcastable against the matmul output).

    Works on host numpy arrays (cache-time quantization in pt/loader.py,
    where touching jnp would place on the remote device) and on device jax
    arrays alike -- ONE copy of the amax/scale/round math, so the two paths
    cannot drift. All ops are exact or correctly-rounded IEEE f32, and both
    backends round half-to-even, so host and device produce identical codes.
    """
    xp = np if isinstance(w, np.ndarray) else jnp
    wf = w.astype(xp.float32)
    amax = xp.max(xp.abs(wf), axis=contract_axis, keepdims=True)
    scale = xp.maximum(amax, xp.float32(1e-12)) / _QMAX
    q = xp.clip(xp.round(wf / scale), -_QMAX, _QMAX).astype(xp.int8)
    return q, xp.squeeze(scale, axis=contract_axis)


def quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-token int8 quantization (over the last axis).

    Returns (int8 x, f32 per-row scales with a trailing keepdim). An
    all-zero row quantizes to zeros with a harmless tiny scale.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def qlinear(x: jnp.ndarray, qw: jnp.ndarray, w_scale: jnp.ndarray,
            b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """y = dequant(quant(x) @ qw) (+ b), returned in ``x``'s dtype.

    ``qw`` is int8 (in, out); ``w_scale`` f32 (out,). The int8 matmul
    accumulates in int32 on the MXU; the per-token and per-channel scales
    combine in the f32 epilogue (XLA fuses the dequant + bias into the
    matmul output write).
    """
    xq, xs = quantize_act(x)
    o = lax.dot_general(
        xq, qw,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = o.astype(jnp.float32) * xs * w_scale.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def dequantize_weight(qw: jnp.ndarray, w_scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """int8 weights back to a float compute dtype (the weight-only path:
    fc2's per-scan-step dequant costs ~60 us/block against a 1 ms matmul)."""
    return (qw.astype(jnp.float32) * w_scale.astype(jnp.float32)).astype(dtype)


def is_quantized_blocks(blocks: Dict[str, Any]) -> bool:
    return "qkv_qw" in blocks or "qkv_gqw" in blocks


def _q_transform(blocks: Dict[str, Any], quantize_one) -> Dict[str, Any]:
    """The ``<name>_w`` -> ``<name>_qw``/``<name>_sw`` key transform shared
    by the host, spec, and device quantizers (one copy, so a new quantized
    layer name or container change is one edit). ``quantize_one(w)`` returns
    the (qw, sw) pair; non-quantized keys pass through."""
    out: Dict[str, Any] = {}
    for key, v in blocks.items():
        name = key[:-2] if key.endswith("_w") else None
        if name in QUANT_COMPUTE + QUANT_WEIGHT_ONLY:
            out[f"{name}_qw"], out[f"{name}_sw"] = quantize_one(v)
        else:
            out[key] = v
    return out


def quantize_vit_blocks_np(blocks: Dict[str, Any]) -> Dict[str, Any]:
    """Host-side (numpy) quantization of a stacked ViT block dict.

    Replaces ``<name>_w`` (L, in, out) with ``<name>_qw`` int8 + ``<name>_sw``
    f32 (L, out) for every matmul in QUANT_COMPUTE + QUANT_WEIGHT_ONLY;
    everything else (biases, norms, LayerScale) passes through. Runs on the
    host so the device upload is the int8 blob, not the float weights.
    """
    return _q_transform(blocks, lambda v: quantize_weight(np.asarray(v)))


def _map_vit_blocks(tree: Any, fn) -> Any:
    """Apply ``fn`` to every stacked ViT blocks dict in a parameter tree
    (detected by its checkpoint-layout ``qkv_w`` key); everything else
    passes through untouched. The single traversal behind quantize_params /
    quantize_spec / quantize_params_device, so a new container shape needs
    one edit, not three."""

    def walk(t):
        if isinstance(t, dict):
            if "qkv_w" in t:  # a stacked ViT blocks dict
                return fn(t)
            return {k: walk(v) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(walk(v) for v in t)
        return t

    return walk(tree)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every ViT instance's blocks in a checkpoint-part tree
    (host numpy). Non-ViT parameters (decoder/head/FOV convs, embeddings,
    upsample chains) are untouched: their cost is bandwidth at small channel
    counts, not MXU rate. Accepts the full params dict or any subtree."""
    return _map_vit_blocks(params, quantize_vit_blocks_np)


def quantize_spec(spec: Dict[str, Any]) -> Dict[str, Any]:
    """Transform a ``models.spec.param_spec`` tree (ShapeDtypeStructs) into
    the quantized layout, for cache validation: each quantized ``<n>_w``
    (L, in, out) becomes ``<n>_qw`` int8 (L, in, out) + ``<n>_sw`` f32
    (L, out)."""

    def q_one(v):
        return (jax.ShapeDtypeStruct(v.shape, jnp.int8),
                jax.ShapeDtypeStruct(v.shape[:-2] + v.shape[-1:], jnp.float32))

    return _map_vit_blocks(spec, lambda b: _q_transform(b, q_one))


def quantize_params_device(params: Dict[str, Any]) -> Dict[str, Any]:
    """Device-side variant of :func:`quantize_params` (one jitted program)
    for parameters already resident in HBM (tests, bench, API sessions that
    loaded float weights). Same scheme, same resulting tree structure."""

    def q_blocks(blocks):
        return _q_transform(blocks, lambda v: quantize_weight(jnp.asarray(v)))

    return jax.jit(lambda p: _map_vit_blocks(p, q_blocks))(params)
