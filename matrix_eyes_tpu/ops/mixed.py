"""Mixed weight precision (``--dtype mixed``): bf16 where it is free,
f32 where it is load-bearing.

Round-4 weight-group attribution (docs/PARITY_RESULTS.md, artifacts
docs/parity/weight-groups-{a,b}.jsonl) measured, at production scale with
true-f32 arithmetic, WHERE bf16 weight rounding hurts: the 1.7 GiB of ViT
block matmul weights cost canonical p99 0.16 %, while the remaining
~88 MiB (decoder/head/FOV convs, encoder glue, embeddings, block
norms/LayerScale/biases) own the rest of the 16.4 % tail. So this policy
keeps ONLY the four block matmul weight kinds in bf16 -- preserving the
entire memory/bandwidth win and the Pallas flash-attention path -- and
stores everything else f32.

Activation side: no model changes are needed. Every nn primitive returns
``y.astype(x.dtype)`` (ops/nn.py), so dtype flow is input-driven: the
pipeline feeds an f32 image (RuntimeConfig.image_dtype), the f32
patch-embed keeps the token carry f32 (the vit_f32_residual layout, the
known lane-aligned 640-pad configuration), block_forward casts branch
inputs down to the weights' bf16 for every MXU matmul, and the decoder /
head / FOV / encoder-glue stages run f32 end-to-end because their weights
and inputs are f32. ``configure_matmul_precision`` sets HIGHEST so those
f32 dots are true f32 (bf16-input dots are unaffected by the setting).

Cost: +~88 MiB HBM over bf16 (4.5 % of the model) and the f32 compute of
the non-ViT stages; the ViT -- where the time is -- is unchanged.
"""

from __future__ import annotations

# The bf16 group: exactly the ViT block matmul WEIGHTS (biases stay f32 --
# the bias add already runs in the f32 accumulator and the output dtype
# follows the activations, so f32 biases are free).
MIXED_BF16_KEYS = ("qkv_w", "proj_w", "fc1_w", "fc2_w",
                   # head-group-major TP layout of the same weights
                   # (parallel.sharding._tp_permute_qkv renames qkv_w)
                   "qkv_gw")


def is_mixed_bf16_leaf(path) -> bool:
    """Whether a tree leaf at ``path`` (a jax KeyPath) belongs to the bf16
    group: a block matmul weight inside a ``blocks`` subtree."""
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    return "blocks" in keys and keys[-1] in MIXED_BF16_KEYS


def cast_params_mixed(params):
    """Cast a parameter tree (host numpy or device jnp) to the mixed
    layout: block matmul weights bf16, every other leaf f32."""
    import jax
    import ml_dtypes
    import numpy as np

    def cast(path, a):
        if hasattr(a, "astype"):
            if is_mixed_bf16_leaf(path):
                # works for both numpy (ml_dtypes) and jnp arrays
                return a.astype(ml_dtypes.bfloat16)
            return a.astype(np.float32)
        return a

    return jax.tree_util.tree_map_with_path(cast, params)
