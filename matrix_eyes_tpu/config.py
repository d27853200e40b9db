"""Model and runtime configuration.

The reference hard-codes its architecture constants (vit.rs:17-19,349-358,
mod.rs:33,262-263) and selects backend/dtype at *compile time* via cargo
features (reconstruction.rs:15-72).  Here both become runtime data:

* ``ModelConfig`` parameterises the whole Depth Pro architecture.  The
  production configuration (``DEPTH_PRO``) matches the reference exactly;
  scaled-down configurations keep the full structural shape (pyramid with
  25+9+1 patches, DPT decoder, FOV head) at tiny sizes so unit tests and
  multi-chip CPU dry-runs stay fast.
* ``RuntimeConfig`` replaces the cargo feature matrix with runtime flags
  (``--dtype f32|bf16``, backend auto-detect via ``jax.devices()``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Depth Pro architecture description.

    Defaults reproduce the reference: ViT-L/16 @ 384^2 (vit.rs:349-358),
    IMG_SIZE = 4 * 384 = 1536 (mod.rs:33), ENCODER_FEATURE_DIMS /
    DECODER_FEATURES (mod.rs:262-263), highres intermediate blocks [5, 11]
    (encoder.rs:227).
    """

    vit_img_size: int = 384
    patch_size: int = 16
    depth: int = 24
    embed_dim: int = 1024
    num_heads: int = 16
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6  # DINOv2/timm value (see models/vit.py docstring)
    encoder_feature_dims: Tuple[int, int, int, int] = (256, 512, 1024, 1024)
    decoder_features: int = 256
    head_last_dims: Tuple[int, int] = (32, 1)
    highres_block_ids: Tuple[int, int] = (5, 11)
    # Carry the ViT residual stream in f32 when the compute dtype is
    # narrower (matmuls stay bf16 on the MXU; LayerNorm inputs, residual
    # adds and LayerScale run f32). bf16 error attribution located the
    # canonical-output error tail in the encoder's residual accumulation
    # across the 24 blocks, not the decoder/head (scripts/
    # bf16_attribution.py); this buys the tail back for a few ms/image.
    vit_f32_residual: bool = True

    @property
    def img_size(self) -> int:
        """Full input resolution: 4x the ViT patch resolution (mod.rs:33)."""
        return self.vit_img_size * 4

    @property
    def tokens_per_side(self) -> int:
        return self.vit_img_size // self.patch_size

    @property
    def num_patch_tokens(self) -> int:
        return self.tokens_per_side * self.tokens_per_side

    @property
    def seq_len(self) -> int:
        """Patch tokens + cls token."""
        return self.num_patch_tokens + 1

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def __post_init__(self):
        if self.vit_img_size % self.patch_size != 0:
            raise ValueError("vit_img_size must be divisible by patch_size")
        if self.patch_size != 16:
            # The fixed upsample chain (merge 4s -> x8 -> head x2 = 64s)
            # closes back to img_size = 4 * vit_img_size only for /16
            # patching; the architecture is tied to it (encoder.rs:85-118).
            raise ValueError("patch_size must be 16 (the upsample chain assumes it)")
        if self.tokens_per_side % 8 != 0:
            # merge() trims tokens_per_side/8 and tokens_per_side/4 feature
            # pixels of overlap (encoder.rs:266-294 uses 3 and 6 for a
            # 24-token grid); the grid must stay divisible.
            raise ValueError("tokens_per_side (vit_img_size/patch_size) must be divisible by 8")
        if self.embed_dim % self.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")


# Production configuration = the reference's architecture.
DEPTH_PRO = ModelConfig()

# Mid-size: structurally identical, big enough that GSPMD's partitioning
# choices (patch-axis split, TP collectives) are representative. Used by
# the multi-chip HLO tests (compile-only on the virtual CPU mesh).
MID = ModelConfig(
    vit_img_size=128,
    patch_size=16,
    depth=4,
    embed_dim=128,
    num_heads=4,
    encoder_feature_dims=(64, 96, 128, 128),
    decoder_features=64,
    head_last_dims=(16, 1),
    highres_block_ids=(1, 3),
)

# Structurally identical, ~1000x smaller: for unit tests and CPU dry-runs.
TINY = ModelConfig(
    vit_img_size=128,
    patch_size=16,
    depth=2,
    embed_dim=16,
    num_heads=2,
    encoder_feature_dims=(8, 12, 16, 16),
    decoder_features=8,
    head_last_dims=(4, 1),
    highres_block_ids=(0, 1),
)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist compiled XLA executables across processes.

    The full-size model takes minutes to compile; without a persistent
    cache every CLI invocation pays it again (the reference's analog is
    its ahead-of-time compiled binary). Safe to call multiple times.
    """
    import os

    if cache_dir is None:
        base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        cache_dir = os.path.join(base, "matrix-eyes-tpu", "jax-cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # caching is best-effort


def default_compute_dtype() -> jnp.dtype:
    """bf16 on TPU (MXU-native), f32 elsewhere."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def configure_matmul_precision(dtype, mixed_bf16: bool = False) -> None:
    """Make ``--dtype f32`` (and the f32 stages of ``--dtype mixed``)
    actually mean f32 on TPU.

    XLA's DEFAULT precision computes an f32 dot on the MXU by rounding
    both inputs to bf16 (one pass) -- exactly the weight/matmul-input
    rounding regime the bf16 error attribution measured (~1.3-1.5 % mean
    canonical error; docs/PARITY_RESULTS.md). The documented
    reference-grade path must instead use the multi-pass bf16
    decomposition (precision HIGHEST, true-f32 results). Half-precision
    runs keep DEFAULT: their matmul inputs are already bf16/f16. The
    mixed mode needs HIGHEST too -- its non-ViT stages run f32, and
    bf16-input dots (the ViT matmuls) ignore the setting either way.

    Applied process-globally at pipeline/session entry (the AOT cache
    keys on the setting, so cached executables never cross regimes).
    """
    if (mixed_bf16 or jnp.dtype(dtype) == jnp.float32) \
            and jax.default_backend() == "tpu":
        jax.config.update("jax_default_matmul_precision", "highest")


_DTYPE_NAMES = {
    "f32": jnp.float32,
    "float32": jnp.float32,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "f16": jnp.float16,
    "float16": jnp.float16,
}


def parse_dtype(name: str) -> jnp.dtype:
    try:
        return _DTYPE_NAMES[name.lower()]
    except KeyError:
        raise ValueError(
            f"Unsupported dtype {name!r}; expected one of "
            f"{sorted(_DTYPE_NAMES) + ['int8', 'mixed']}")


def parse_dtype_policy(name: str):
    """CLI dtype flag -> (compute dtype or None, quantize_int8, mixed_bf16).

    ``int8`` and ``mixed`` are weight-precision policies, not compute
    dtypes: the ViT runs bf16 either way. ``int8`` additionally quantizes
    the block matmul weights to int8 on the MXU (ops/quant.py); ``mixed``
    keeps ONLY those matmul weights bf16 and everything else (decoder,
    head, FOV, embeddings, norms) f32 with true-f32 arithmetic -- the
    round-4 weight-group attribution bounds its weight-side p99 at 0.16 %
    vs all-bf16's 16.4 % for +88 MiB (ops/mixed.py). Everything else maps
    through parse_dtype.
    """
    if name.lower() == "int8":
        return jnp.bfloat16, True, False
    if name.lower() == "mixed":
        return jnp.bfloat16, False, True
    return parse_dtype(name), False, False


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Runtime replacement for the reference's cargo feature matrix.

    dtype: parameter/compute dtype policy (accumulation is always f32).
    seed: stereogram noise PRNG seed. The reference uses a thread RNG
        (output.rs:163) so its noise is not reproducible; we use
        ``jax.random`` with an explicit seed and document determinism.
    flash_attention: use the Pallas flash-attention kernel on TPU.
    quantize_int8: opt-in int8 ViT weights (``--dtype int8``): block matmul
        weights quantized per-output-channel to int8, activations per-token
        dynamic, int8 x int8 -> int32 on the MXU (ops/quant.py). Requires a
        half compute dtype (bf16).
    mixed_bf16: opt-in mixed weight precision (``--dtype mixed``): ViT
        block matmul weights bf16, everything else f32 with true-f32
        arithmetic (ops/mixed.py). The ViT compute dtype stays bf16.
    """

    dtype: Optional[jnp.dtype] = None
    seed: int = 0
    flash_attention: Optional[bool] = None  # None = auto (TPU only)
    quantize_int8: bool = False
    mixed_bf16: bool = False

    def __post_init__(self):
        if self.quantize_int8 and self.dtype is not None \
                and jnp.dtype(self.dtype) != jnp.bfloat16:
            raise ValueError(
                "quantize_int8 requires the bf16 compute dtype "
                f"(got {jnp.dtype(self.dtype).name})")
        if self.mixed_bf16:
            if self.quantize_int8:
                raise ValueError(
                    "mixed_bf16 and quantize_int8 are mutually exclusive "
                    "weight-precision policies")
            if self.dtype is not None \
                    and jnp.dtype(self.dtype) != jnp.bfloat16:
                raise ValueError(
                    "mixed_bf16 requires the bf16 compute dtype "
                    f"(got {jnp.dtype(self.dtype).name})")

    def resolved_dtype(self) -> jnp.dtype:
        if self.quantize_int8 or self.mixed_bf16:
            return jnp.bfloat16
        return self.dtype if self.dtype is not None else default_compute_dtype()

    def image_dtype(self) -> jnp.dtype:
        """Dtype the source image is preprocessed to. Mixed mode feeds the
        model an f32 image: dtype flow is input-driven (every nn primitive
        returns its input's dtype), so the f32 image is what keeps the
        patch embed, the token carry and the non-ViT stages f32 while
        block_forward casts matmul inputs down to the weights' bf16."""
        if self.mixed_bf16:
            return jnp.float32
        return self.resolved_dtype()

    def use_flash_attention(self) -> bool:
        if self.flash_attention is not None:
            return self.flash_attention
        return jax.default_backend() == "tpu"
