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

Lane alignment: the fused qkv kernel takes the token axis as ONE block, so
a 577-token input simply uses a 640-row block that overhangs the array --
Mosaic masks the out-of-bounds stores, and the kernel zero-masks the
overhang rows of k/v before they touch the MXU (out-of-bounds *loads* are
unspecified garbage, and an Inf/NaN there would poison valid rows through
the score matrix; garbage q rows are harmless -- each output row depends
only on its own q row and is dropped by the masked store). The surrounding
matmuls therefore run at the true 577 tokens (no padded-row FLOPs, no
pad/slice HBM pass). Padded key columns are masked to -1e30 before the
softmax (not -inf, so fully-padded query rows stay finite instead of NaN);
the separate q/k/v entry point (attention_flash) still pads explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634  # exp(x) = exp2(x * log2 e)


def _qk_log2(q, k, scale: float, n_valid: int, ones):
    """Masked log2-domain scores: scale (with log2 e) folded into q; the
    padded-key mask rides an extra contraction column (0 for valid rows,
    -1e30 for padded), added by the MXU during the matmul itself."""
    n_pad = q.shape[0]
    dt = q.dtype
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(dt)
    if n_valid < n_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
        bias = jnp.where(row < n_valid, jnp.float32(0.0),
                         jnp.float32(-1e30)).astype(dt)
        qs = jnp.concatenate([qs, ones], axis=1)
        k = jnp.concatenate([k, bias], axis=1)
    return jax.lax.dot_general(
        qs, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Half inputs pin DEFAULT: Mosaic rejects bf16 dot inputs when the
        # global matmul precision is HIGHEST (set by the f32/mixed modes);
        # f32 inputs keep the inherited precision (see ops/conv3x3.py)
        precision=(jax.lax.Precision.DEFAULT
                   if qs.dtype != jnp.float32 else None),
    )  # (N_pad, N_pad), log2-domain scores, padded cols at -1e30


def _softmax_pv(s, v, ones):
    """Row softmax of log2-domain scores times v, with the denominator
    produced by the P@V matmul itself (a ones column appended to v -- at
    D = 64 the MXU output lanes are otherwise wasted) and normalisation
    deferred to the (N, D) output.  Two VPU passes over the score tile
    remain: row max, fused sub+exp2+cast."""
    d = v.shape[1]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m).astype(v.dtype)
    ov = jax.lax.dot_general(
        p, jnp.concatenate([v, ones], axis=1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT
                   if p.dtype != jnp.float32 else None),  # see _scores
    )  # (N_pad, D + 1): P@V alongside the row sums
    return ov[:, :d] / ov[:, d:d + 1]


def _one_head(q, k, v, scale: float, n_valid: int):
    """(N, D) single-head attention, scores in f32 on the MXU.

    The kernel is VPU-bound, not MXU-bound: at D = 64 both matmuls already
    sit at the MXU\'s 128-minimum-dim time floor, so every full pass over
    the (N, N) score tile is pure added latency (the naive 7-pass softmax
    measured 4.3x the matmul floor on v5e).  See _qk_log2 / _softmax_pv --
    the same helpers back the fused qkv-layout kernel, so the numerics
    cannot diverge between the two entry points.
    """
    ones = jnp.ones((q.shape[0], 1), q.dtype)
    return _softmax_pv(_qk_log2(q, k, scale, n_valid, ones), v, ones)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    o_ref[0] = _one_head(q_ref[0], k_ref[0], v_ref[0], scale, n_valid).astype(o_ref.dtype)


def _attention_qkv_kernel(qkv_q_ref, qkv_k_ref, qkv_v_ref, o_ref, *,
                          scale: float, n_valid: int, heads_per_block: int,
                          zero_tail: bool = False, pipelined: bool = True):
    """Block holds ``heads_per_block`` heads side by side on the feature
    axis (so the block width is a lane multiple); attend each in turn.

    ``zero_tail``: the token block overhangs the array (an unaligned token
    count, e.g. 577 rows under a 640-row block), so rows >= n_valid of k/v
    hold unspecified out-of-bounds values and are zeroed before use -- the
    -1e30 score bias alone cannot save a valid row from an Inf*q = NaN
    score contributed by garbage keys, and P@V multiplies garbage v rows
    by exactly-0 weights (0 * Inf = NaN). q is left unmasked: garbage q
    rows only produce garbage *output* rows, which the masked store drops.

    With ``pipelined``, the head loop is software-pipelined: head h+1's
    QK^T (MXU) is issued before head h's softmax (VPU), making the
    cross-head independence explicit so the scheduler can overlap matrix
    and vector work.
    """
    n_pad = qkv_q_ref.shape[1]
    d = qkv_q_ref.shape[2] // heads_per_block
    dt = o_ref.dtype
    ones = jnp.ones((n_pad, 1), dt)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)

    def tail0(x):
        if not zero_tail:
            return x
        return jnp.where(row < n_valid, x, jnp.zeros((), x.dtype))

    def qk(h):
        sl = slice(h * d, (h + 1) * d)
        return _qk_log2(qkv_q_ref[0, :, sl], tail0(qkv_k_ref[0, :, sl]),
                        scale, n_valid, ones)

    def softmax_pv(s, h):
        sl = slice(h * d, (h + 1) * d)
        o_ref[0, :, sl] = _softmax_pv(s, tail0(qkv_v_ref[0, :, sl]),
                                      ones).astype(dt)

    if pipelined:
        s_cur = qk(0)
        for h in range(heads_per_block):
            s_next = qk(h + 1) if h + 1 < heads_per_block else None
            softmax_pv(s_cur, h)
            s_cur = s_next
    else:
        for h in range(heads_per_block):
            softmax_pv(qk(h), h)


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


def flash_supported_dtype(dtype) -> bool:
    """Mosaic (the Pallas TPU compiler) supports f32/bf16 but not f16
    ("Unsupported type in mosaic dialect: 'f16'"); f16 runs fall back to
    the XLA attention path."""
    return jnp.dtype(dtype) != jnp.float16


def _min_heads_per_block(num_heads: int, head_dim: int) -> int:
    """Smallest head group whose feature width is lane-aligned (128-
    divisible). The single source of this rule: the fusability gate and
    both heads_per_block branches in attention_flash_qkv must agree, or
    the gate admits configs the kernel then rejects at runtime."""
    hpb = 1
    while (hpb * head_dim) % 128 != 0 and hpb < num_heads:
        hpb += 1
    return hpb


def qkv_fusable(num_heads: int, head_dim: int) -> bool:
    """True if heads can be grouped into lane-aligned (128-divisible)
    feature blocks for attention_flash_qkv."""
    hpb = _min_heads_per_block(num_heads, head_dim)
    return (hpb * head_dim) % 128 == 0 and num_heads % hpb == 0


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "n_valid",
                                             "heads_per_block", "pipelined",
                                             "interpret"))
def attention_flash_qkv(qkv: jnp.ndarray, num_heads: int, scale: float,
                        n_valid: int | None = None,
                        heads_per_block: int | None = None,
                        pipelined: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused attention straight from the qkv projection's output layout.

    qkv: (B, N, 3*C) with the feature axis ordered [q|k|v] x [head] x [dim]
    (exactly what ``x @ qkv_w`` produces, vit.rs:60-64). N may be any token
    count: an unaligned N runs under a lane-rounded overhanging block with
    the garbage rows zero-masked in-kernel (module docstring), so callers
    never pad -- the surrounding matmuls keep the true token count.
    ``n_valid`` masks keys past it for callers that DID pre-pad the axis.
    Returns (B, N, C) -- token-major, ready for the output projection.

    Compared to ``attention_flash`` this removes every layout change around
    the kernel: the (B, N, 3C) -> (3, B, H, N, D) transpose, the kernel
    input reshape and the output head-merge transpose are all replaced by
    BlockSpec column indexing into the qkv buffer (zero data movement).
    """
    B, N, C3 = qkv.shape
    if C3 % 3 != 0 or (C3 // 3) % num_heads != 0:
        # floor division below would otherwise silently misalign the
        # BlockSpec column indexing into the [q|k|v] sections
        raise ValueError(
            f"qkv feature axis {C3} must be 3 * num_heads * head_dim "
            f"(num_heads={num_heads})")
    C = C3 // 3
    D = C // num_heads
    H = num_heads
    n_valid = N if n_valid is None else n_valid
    # The token block needs only SUBLANE (row-tile) alignment, not lane
    # alignment: Mosaic pads the (N, N) score tile to full 128-lane tiles
    # internally either way, so a 592-row block costs the same MXU time as
    # 640 while the masked key bias keeps the softmax exact. A 16-multiple
    # N therefore runs as ONE exact block (no overhang); only a ragged N
    # (e.g. a raw 577) needs an overhanging block, whose out-of-bounds rows
    # are garbage and must be zero-masked (module docstring). Overhanging
    # DMA measured ~2.4 us/program of extra cost on v5e -- prefer feeding
    # this kernel 16-aligned token counts (models/vit.py pads once to 16).
    n_pad = _round_up(N, 16)
    zero_tail = n_pad != N  # block overhangs the array: mask the OOB rows
    # Mosaic wants lane-aligned block widths: group heads until the block
    # spans a multiple of 128 features; beyond alignment, larger groups
    # amortise per-program overhead. Cap the block width by dtype so the
    # double-buffered q/k/v/o blocks plus the f32 score tiles stay inside
    # the 16 MB VMEM budget: 512 features at <=2-byte dtypes (1024-wide
    # measured <1% faster but sits at the VMEM cliff); 256 at f32 (a 512
    # cap was measured to OOM scoped vmem at 22.5 MB on the f32 FOV path).
    width_cap = 512 if jnp.dtype(qkv.dtype).itemsize <= 2 else 256
    min_hpb = _min_heads_per_block(H, D)
    if heads_per_block:
        hpb = max(heads_per_block, 1)
        while (hpb * D) % 128 != 0 and hpb < H:
            hpb += 1
        # An explicit heads_per_block must obey the same VMEM budget the
        # auto branch enforces (a 512-wide f32 block was measured to OOM
        # scoped VMEM at 22.5 MB); the minimal lane-aligned group is always
        # admitted since no narrower block can exist.
        if hpb * D > width_cap and hpb > min_hpb:
            raise ValueError(
                f"heads_per_block={heads_per_block} gives a {hpb * D}-wide "
                f"block, over the {width_cap}-feature VMEM cap for "
                f"{jnp.dtype(qkv.dtype).name}")
    else:
        hpb = min_hpb
        best = hpb
        while hpb * 2 <= H and H % (hpb * 2) == 0 and (hpb * 2 * D) <= width_cap \
                and (hpb * 2 * D) % 128 == 0:
            hpb *= 2
            best = hpb
        hpb = best
    if H % hpb != 0 or (hpb * D) % 128 != 0:
        raise ValueError(f"cannot lane-align heads: H={H} D={D}")
    n_blocks = H // hpb
    W = hpb * D

    kernel = functools.partial(_attention_qkv_kernel, scale=float(scale),
                               n_valid=min(n_valid, N), heads_per_block=hpb,
                               zero_tail=zero_tail, pipelined=pipelined)

    def col(sec):  # feature-axis block index for q/k/v section + head group
        return lambda b, h: (b, 0, sec * n_blocks + h)

    spec = lambda sec: pl.BlockSpec((1, n_pad, W), col(sec),
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((1, n_pad, W), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * N * N * D),
            bytes_accessed=4 * B * N * C * qkv.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out
