"""Fused attention Pallas TPU kernel for the Depth Pro ViTs.

Depth Pro's attention shape is unusual for flash kernels: 577 tokens (24x24
patches + cls), 64-dim heads, but a large (batch x heads) grid -- 35 x 16 =
560 independent attention problems in the pyramid encoder. The XLA path
materialises the (B, H, 577, 577) score tensor: ~373 MB of HBM write+read
per layer in bf16, which dominates the layer time on a v5e.

This kernel computes one (batch, head) problem per grid program entirely in
VMEM: S = Q K^T (f32 on the MXU), masked row softmax, P V. At N_pad = 640,
S is 640*640*4 B = 1.6 MB of VMEM -- no online-softmax tiling needed; this
is the single-block regime where flash attention degenerates to "just never
touch HBM with the scores".

The wrapper pads the token axis to a lane multiple (577 -> 640) and slices
the result back; padded key columns are masked to -1e30 before the softmax
(not -inf, so fully-padded query rows stay finite instead of NaN).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0]  # (N_pad, D)
    k = k_ref[0]
    v = v_ref[0]
    n_pad = q.shape[0]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N_pad, N_pad)
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    s = jnp.where(col < n_valid, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o = jax.lax.dot_general(
        p.astype(q.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("scale", "n_valid", "interpret"))
def attention_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                    n_valid: int | None = None, interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (B, H, N, D); returns (B, H, N, D). Same semantics as
    ops.attention.attention_xla (vit.rs:57-76).

    ``n_valid``: number of real tokens when the caller already padded the
    token axis (keys beyond it are masked out); defaults to N.
    """
    B, H, N, D = q.shape
    n_valid = N if n_valid is None else n_valid
    n_pad = _round_up(N, 128)
    if n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    bh = B * H
    qf = q.reshape(bh, n_pad, D)
    kf = k.reshape(bh, n_pad, D)
    vf = v.reshape(bh, n_pad, D)

    kernel = functools.partial(_attention_kernel, scale=float(scale), n_valid=n_valid)
    spec = pl.BlockSpec((1, n_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (2 * n_pad * n_pad * D),
            bytes_accessed=4 * bh * n_pad * D * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(B, H, n_pad, D)
    return out[:, :, :N, :]
