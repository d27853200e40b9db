"""Multi-head self-attention for the ViT blocks.

Two implementations with identical semantics (reference vit.rs:57-76:
``softmax((q * scale) @ k^T) @ v``):

* ``attention_xla``: plain jnp ops -- used on CPU and as the numerical
  reference in tests;
* ``attention_flash`` (ops/flash_attention.py): a fused Pallas TPU kernel
  that never materialises the (B, H, N, N) score tensor in HBM. For the
  35-patch pyramid batch the scores alone are 35*16*577*577*4B = 745 MB of
  HBM traffic per layer in f32 -- the fused kernel keeps them in VMEM.

``attention`` dispatches on the runtime config.
"""

from __future__ import annotations

import jax.numpy as jnp

from matrix_eyes_tpu.ops.nn import ACC_T


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q, k, v: (B, H, N, D); returns (B, H, N, D)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k,
                   preferred_element_type=ACC_T)
    p = jnp.asarray(jnp.exp(s - jnp.max(s, axis=-1, keepdims=True)))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v, preferred_element_type=ACC_T)
    return o.astype(q.dtype)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
              use_flash: bool = False, n_valid: int | None = None) -> jnp.ndarray:
    """``n_valid``: true token count when the caller pre-padded the token
    axis for the flash kernel (models/vit.py pads once for all 24 blocks);
    the XLA path is only used unpadded."""
    if use_flash:
        from matrix_eyes_tpu.ops.flash_attention import (
            attention_flash,
            flash_supported_dtype,
        )

        if flash_supported_dtype(q.dtype):
            return attention_flash(q, k, v, scale, n_valid=n_valid)
        use_flash = False
    assert n_valid is None or n_valid == q.shape[2], (
        "padded tokens require the flash kernel's key masking")
    return attention_xla(q, k, v, scale)
