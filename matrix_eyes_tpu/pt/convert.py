"""Convert a ``depth_pro.pt`` state dict to TPU-native parameter pytrees.

This is the reference's KeyRemapper + adapter chain (mod.rs:174-249)
rebuilt: instead of renaming keys to fit a Burn module tree, we map each
checkpoint tensor into the layouts that the JAX model consumes (see
ops/nn.py): linears transposed to (in, out), convs OIHW -> HWIO, 1x1 convs
to plain matrices, 2x2/s2 transposed convs to (in, 4*out) matmul weights,
the patch-embed conv to a (p*p*3, embed) matrix, and ViT block parameters
stacked along a leading layer axis for ``lax.scan``.

Key naming follows the real checkpoint (torch nn.Sequential containers with
ReLU/Identity holes -- the indices the reference's remapper rewrites at
mod.rs:185-210): ``head.{0,1,2,4}``, ``fov.encoder.{0,1}``,
``fov.head.{0,2,4}``, ``decoder.convs.{1..4}`` (Identity at 0),
``...resnet{1,2}.residual.{1,3}``. Compact (hole-free) indices are accepted
as fallbacks.

Validation mirrors mod.rs:238-243: every parameter required by
``models.spec.param_spec`` must be found (missing -> CheckpointMissingKeys)
with the exact expected shape (-> CheckpointBadShape); unused checkpoint
keys are ignored, like the reference's unused snapshots.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import ModelConfig
from matrix_eyes_tpu.errors import CheckpointBadShape, CheckpointMissingKeys
from matrix_eyes_tpu.models.spec import param_spec

PARTS = ("encoder", "decoder", "head", "fov")


def t_linear(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> (in, out)."""
    return np.ascontiguousarray(w.T)


def t_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def t_conv1x1(w: np.ndarray) -> np.ndarray:
    """torch 1x1 Conv2d (O, I, 1, 1) -> channel matmul (I, O)."""
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def t_deconv2x2(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, 2, 2) -> (I, 4*O), inner order (di, dj, o)."""
    i, o = w.shape[0], w.shape[1]
    return np.ascontiguousarray(w.transpose(0, 2, 3, 1).reshape(i, 4 * o))


def t_patch_embed(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (D, 3, p, p) -> ((p, p, 3) flattened, D)."""
    d = w.shape[0]
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(-1, d))


def t_id(w: np.ndarray) -> np.ndarray:
    return w


class _KeySpace:
    """Flat state-dict access that records missing keys instead of raising,
    so the final error lists everything at once (mod.rs:241-243)."""

    def __init__(self, flat: Dict[str, np.ndarray]):
        self.flat = flat
        self.missing: List[str] = []

    def take(self, *candidates: str, transform: Callable = t_id) -> Optional[np.ndarray]:
        for name in candidates:
            if name in self.flat:
                return transform(np.asarray(self.flat[name]))
        self.missing.append(candidates[0])
        return None

    def __contains__(self, name: str) -> bool:
        return name in self.flat


def _convert_vit(ks: _KeySpace, p: str, cfg: ModelConfig) -> Dict[str, Any]:
    blocks: Dict[str, List[np.ndarray]] = {}

    def blk(field: str, key_fmt: str, transform: Callable = t_id):
        vals = [ks.take(key_fmt.format(p=p, i=i), transform=transform)
                for i in range(cfg.depth)]
        blocks[field] = vals

    blk("norm1_scale", "{p}.blocks.{i}.norm1.weight")
    blk("norm1_bias", "{p}.blocks.{i}.norm1.bias")
    blk("qkv_w", "{p}.blocks.{i}.attn.qkv.weight", t_linear)
    blk("qkv_b", "{p}.blocks.{i}.attn.qkv.bias")
    blk("proj_w", "{p}.blocks.{i}.attn.proj.weight", t_linear)
    blk("proj_b", "{p}.blocks.{i}.attn.proj.bias")
    blk("ls1", "{p}.blocks.{i}.ls1.gamma")
    blk("norm2_scale", "{p}.blocks.{i}.norm2.weight")
    blk("norm2_bias", "{p}.blocks.{i}.norm2.bias")
    blk("fc1_w", "{p}.blocks.{i}.mlp.fc1.weight", t_linear)
    blk("fc1_b", "{p}.blocks.{i}.mlp.fc1.bias")
    blk("fc2_w", "{p}.blocks.{i}.mlp.fc2.weight", t_linear)
    blk("fc2_b", "{p}.blocks.{i}.mlp.fc2.bias")
    blk("ls2", "{p}.blocks.{i}.ls2.gamma")

    stacked = {
        k: (np.stack(v) if all(x is not None for x in v) else None)
        for k, v in blocks.items()
    }
    return {
        "patch_embed": {
            "w": ks.take(f"{p}.patch_embed.proj.weight", transform=t_patch_embed),
            "b": ks.take(f"{p}.patch_embed.proj.bias"),
        },
        "cls_token": ks.take(f"{p}.cls_token"),
        "pos_embed": ks.take(f"{p}.pos_embed"),
        "blocks": stacked,
        "norm": {
            "scale": ks.take(f"{p}.norm.weight"),
            "bias": ks.take(f"{p}.norm.bias"),
        },
    }


def _convert_upsample(ks: _KeySpace, p: str, n_up: int) -> Dict[str, Any]:
    return {
        "proj": ks.take(f"{p}.0.weight", transform=t_conv1x1),
        "deconvs": [
            ks.take(f"{p}.{i + 1}.weight", transform=t_deconv2x2) for i in range(n_up)
        ],
    }


def _convert_rcu(ks: _KeySpace, p: str) -> Dict[str, Any]:
    # Real checkpoint: Sequential(ReLU, conv, ReLU, conv) -> indices 1, 3;
    # compact (hole-free) fallback: 0, 1. The two conventions are
    # disambiguated by which index-3 key exists, so conv2's fallback to
    # residual.1 is only taken when residual.3 is absent -- i.e. the whole
    # block is compact -- and cannot collide with conv1's primary.
    compact = f"{p}.residual.3.weight" not in ks
    i1, i2 = ("0", "1") if compact else ("1", "3")
    return {
        "conv1_w": ks.take(f"{p}.residual.{i1}.weight", transform=t_conv),
        "conv1_b": ks.take(f"{p}.residual.{i1}.bias"),
        "conv2_w": ks.take(f"{p}.residual.{i2}.weight", transform=t_conv),
        "conv2_b": ks.take(f"{p}.residual.{i2}.bias"),
    }


def _convert_encoder(ks: _KeySpace, cfg: ModelConfig) -> Dict[str, Any]:
    return {
        "patch_encoder": _convert_vit(ks, "encoder.patch_encoder", cfg),
        "image_encoder": _convert_vit(ks, "encoder.image_encoder", cfg),
        "upsample_latent0": _convert_upsample(ks, "encoder.upsample_latent0", 3),
        "upsample_latent1": _convert_upsample(ks, "encoder.upsample_latent1", 2),
        "upsample0": _convert_upsample(ks, "encoder.upsample0", 1),
        "upsample1": _convert_upsample(ks, "encoder.upsample1", 1),
        "upsample2": _convert_upsample(ks, "encoder.upsample2", 1),
        "upsample_lowres": {
            "w": ks.take("encoder.upsample_lowres.weight", transform=t_deconv2x2),
            "b": ks.take("encoder.upsample_lowres.bias"),
        },
        "fuse_lowres": {
            "w": ks.take("encoder.fuse_lowres.weight", transform=t_conv1x1),
            "b": ks.take("encoder.fuse_lowres.bias"),
        },
    }


def _convert_decoder(ks: _KeySpace, cfg: ModelConfig) -> Dict[str, Any]:
    dec = cfg.decoder_features
    dims = (dec,) + tuple(cfg.encoder_feature_dims)
    # The finest level is at decoder width by construction (the latent0
    # upsample chain projects to ``dec``), so convs[0] is an Identity in
    # the Apple layout and the real checkpoint's conv indices run 1..n
    # (nn.ModuleList counts the Identity); a compact re-export runs
    # 0..n-1. Both conventions share middle indices, so detect by the
    # presence of the highest Apple-style index rather than per-key
    # fallbacks (which would silently grab the wrong neighbour).
    apple_style = f"decoder.convs.{len(dims) - 1}.weight" in ks
    offset = 1 if apple_style else 0
    convs: List[Dict[str, Any]] = []
    for j in range(1, len(dims)):
        convs.append({"w": ks.take(f"decoder.convs.{j - 1 + offset}.weight",
                                   transform=t_conv)})
    fusions = []
    for i in range(len(dims)):
        p = f"decoder.fusions.{i}"
        f: Dict[str, Any] = {
            "resnet1": _convert_rcu(ks, f"{p}.resnet1"),
            "resnet2": _convert_rcu(ks, f"{p}.resnet2"),
            "out_conv_w": ks.take(f"{p}.out_conv.weight", transform=t_conv1x1),
            "out_conv_b": ks.take(f"{p}.out_conv.bias"),
        }
        if i != 0:
            f["deconv_w"] = ks.take(f"{p}.deconv.weight", transform=t_deconv2x2)
        fusions.append(f)
    return {"convs": convs, "fusions": fusions}


def _convert_head(ks: _KeySpace) -> Dict[str, Any]:
    # Real checkpoint: Sequential with ReLUs at 3 and 5 -> conv indices
    # 0, 1, 2, 4 (the reference remaps exactly these, mod.rs:198-205);
    # compact fallback puts the last conv at 3.
    return {
        "conv0_w": ks.take("head.0.weight", transform=t_conv),
        "conv0_b": ks.take("head.0.bias"),
        "deconv1_w": ks.take("head.1.weight", transform=t_deconv2x2),
        "deconv1_b": ks.take("head.1.bias"),
        "conv2_w": ks.take("head.2.weight", transform=t_conv),
        "conv2_b": ks.take("head.2.bias"),
        "conv3_w": ks.take("head.4.weight", "head.3.weight", transform=t_conv1x1),
        "conv3_b": ks.take("head.4.bias", "head.3.bias"),
    }


def _convert_fov(ks: _KeySpace, cfg: ModelConfig) -> Dict[str, Any]:
    # Real checkpoint: Sequential with ReLUs -> conv indices 0, 2, 4;
    # compact re-export -> 0, 1, 2. fov.head.2 exists in both conventions,
    # so detect by the Apple-only index 4.
    apple_style = "fov.head.4.weight" in ks
    i1, i2 = ("2", "4") if apple_style else ("1", "2")
    return {
        "encoder": _convert_vit(ks, "fov.encoder.0", cfg),
        "linear": {
            "w": ks.take("fov.encoder.1.weight", transform=t_linear),
            "b": ks.take("fov.encoder.1.bias"),
        },
        "downsample0": {
            "w": ks.take("fov.downsample.0.weight", transform=t_conv),
            "b": ks.take("fov.downsample.0.bias"),
        },
        "head0": {
            "w": ks.take("fov.head.0.weight", transform=t_conv),
            "b": ks.take("fov.head.0.bias"),
        },
        "head1": {
            "w": ks.take(f"fov.head.{i1}.weight", transform=t_conv),
            "b": ks.take(f"fov.head.{i1}.bias"),
        },
        "head2": {
            "w": ks.take(f"fov.head.{i2}.weight", transform=t_conv),
            "b": ks.take(f"fov.head.{i2}.bias"),
        },
    }


def infer_config(flat: Dict[str, np.ndarray]) -> ModelConfig:
    """Derive the ModelConfig from checkpoint tensor shapes.

    The reference hard-codes its architecture; inferring it instead lets the
    same CLI load scaled-down checkpoints (test fixtures) and future
    variants. eps and highres block ids are not recoverable from shapes:
    eps uses the DINOv2 value, highres ids scale like the production
    network's (depth/4 - 1, depth/2 - 1) -> (5, 11) at depth 24.
    """
    def need(key: str, *fallbacks: str) -> np.ndarray:
        # Fallbacks mirror the converters' Sequential-index candidate order
        # (Apple hole-indices first, compact re-export second), so a compact
        # checkpoint is inferable, not just convertible-with-explicit-cfg.
        for k in (key,) + fallbacks:
            if k in flat:
                return flat[k]
        raise CheckpointMissingKeys([key])

    d = int(need("encoder.patch_encoder.cls_token").shape[-1])
    n_tokens = int(need("encoder.patch_encoder.pos_embed").shape[1]) - 1
    s = int(round(n_tokens ** 0.5))
    patch = int(round((need("encoder.patch_encoder.patch_embed.proj.weight").shape[-1])))
    depth = 1 + max(
        (int(k.split(".")[3]) for k in flat
         if k.startswith("encoder.patch_encoder.blocks.")),
        default=0,
    )
    qkv_out = int(need("encoder.patch_encoder.blocks.0.attn.qkv.weight").shape[0])
    assert qkv_out == 3 * d, "unexpected qkv shape"
    # The head count is not recoverable from any state-dict shape (qkv is a
    # single fused (3d, d) matrix). Assume the ViT-standard head_dim=64
    # whenever the width allows it (true for every DINOv2 variant, incl. the
    # production ViT-L/16: 1024/64 = 16 heads); otherwise fall back to two
    # heads for small test widths. Converted caches persist the resolved
    # num_heads in <stem>-config.json, which the loader prefers over this
    # inference, so the assumption only governs first contact with a raw .pt.
    head_dim = 64 if d % 64 == 0 else d // 2
    num_heads = d // head_dim
    mlp_hidden = int(need("encoder.patch_encoder.blocks.0.mlp.fc1.weight").shape[0])
    ef0 = int(need("encoder.upsample_latent1.0.weight").shape[0])
    ef1 = int(need("encoder.upsample0.0.weight").shape[0])
    ef2 = int(need("encoder.upsample1.0.weight").shape[0])
    ef3 = int(need("encoder.upsample2.0.weight").shape[0])
    dec = int(need("head.0.weight").shape[1])
    l0 = int(need("head.2.weight").shape[0])
    l1 = int(need("head.4.weight", "head.3.weight").shape[0])
    return ModelConfig(
        vit_img_size=s * patch,
        patch_size=patch,
        depth=depth,
        embed_dim=d,
        num_heads=num_heads,
        mlp_ratio=mlp_hidden // d,
        encoder_feature_dims=(ef0, ef1, ef2, ef3),
        decoder_features=dec,
        head_last_dims=(l0, l1),
        highres_block_ids=(max(0, depth // 4 - 1), max(1, depth // 2 - 1)),
    )


def convert_state_dict(
    cfg: ModelConfig,
    flat: Dict[str, np.ndarray],
    dtype=jnp.float32,
    parts: Sequence[str] = PARTS,
    device: bool = True,
) -> Dict[str, Any]:
    """Convert a flat torch state dict to the model parameter pytree.

    Raises CheckpointMissingKeys / CheckpointBadShape on validation failure,
    mirroring the reference's hard errors (mod.rs:238-243). Casting to the
    runtime dtype happens here, like the reference's HalfPrecisionAdapter
    (mod.rs:125-164).

    ``device=False`` keeps the leaves as host numpy arrays (cast to the
    numpy view of ``dtype``): through a remote device relay, a per-leaf
    ``jnp.asarray`` costs a dispatch round-trip per tensor (~0.5 s x ~900
    leaves); the loader instead writes caches from host memory and uploads
    one blob per part (loader._place_part).
    """
    ks = _KeySpace(flat)
    converters = {
        "encoder": lambda: _convert_encoder(ks, cfg),
        "decoder": lambda: _convert_decoder(ks, cfg),
        "head": lambda: _convert_head(ks),
        "fov": lambda: _convert_fov(ks, cfg),
    }
    params = {part: converters[part]() for part in parts}
    if ks.missing:
        raise CheckpointMissingKeys(ks.missing)

    spec = param_spec(cfg, include_fov="fov" in parts)
    spec = {part: spec[part] for part in parts}
    flat_params, tree = jax.tree.flatten(params)
    flat_spec, spec_tree = jax.tree.flatten(spec)
    if tree != spec_tree:
        raise CheckpointBadShape(
            f"converted tree structure does not match the model spec:\n{tree}\nvs\n{spec_tree}")
    bad = []
    for got, want in zip(flat_params, flat_spec):
        if tuple(got.shape) != tuple(want.shape):
            bad.append(f"expected {want.shape}, got {got.shape}")
    if bad:
        raise CheckpointBadShape("; ".join(bad[:10]))
    if device:
        out = [jnp.asarray(a, dtype=dtype) for a in flat_params]
    else:
        np_dtype = jnp.dtype(dtype)
        out = [np.ascontiguousarray(np.asarray(a, dtype=np_dtype)) for a in flat_params]
    return jax.tree.unflatten(tree, out)
