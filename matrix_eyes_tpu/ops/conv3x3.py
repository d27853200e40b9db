"""Pallas TPU kernel: 3x3 stride-1 pad-1 convolution as 9 shifted matmuls.

The decoder's hot path (decoder.rs:35-44 RCUs, 768^2 @ 256 channels) runs
at ~106 TFLOP/s through XLA's conv lowering on v5e -- ~57% of the chip.
The same convolution expressed as 9 shifted (R*W, Cin) @ (Cin, Cout)
matmuls keeps the MXU in plain matmul mode at MXU-native shapes.

Row halo without manual DMA: the kernel receives the SAME row-padded input
through two BlockSpecs -- an R-row block at rows [i*R, i*R+R) and a 2-row
halo block at rows [i*R+R, i*R+R+2) (the 3x3 taps only ever read two rows
past the block).  Column halo is handled inside the kernel with
slice+zero-column concatenation (the full width is resident in VMEM).
Both input streams are auto double-buffered by the Pallas pipeline; input
read traffic is (R+2)/R of the tensor (1.25x at R=8), the same as a
manual-DMA halo fetch would pay.

Used when: stride 1, padding 1, HWIO weights, NHWC activations, channels
lane-aligned (Cin/Cout multiples of 128), the VMEM footprint estimate
fits at some row-block size, and the run is single-chip TPU or a
``patch_sharded`` mesh whose data axis divides the batch (the kernel is
shard_mapped over the batch; a model axis replicates, matching the
replicated decoder parameters).  The generic ``nn.conv2d`` remains the
fallback everywhere else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x0_ref, x1_ref, w_ref, b_ref, *refs, rows: int,
                    relu_in: bool = False, n_skips: int = 0):
    """x0: (rows, W, Cin) row block of the row-padded input at padded rows
    [i*R, i*R+R); x1: the (2, W, Cin) halo block at [i*R+R, i*R+R+2);
    o: (rows, W, Cout).

    ``relu_in`` applies ReLU to the input inside the kernel (one VMEM pass,
    instead of a materialised XLA pass over the whole HBM tensor before the
    conv); ``n_skips`` extra input blocks are residuals added to the output
    (the RCU's skip connection, decoder.rs:43, and the fusion block's
    skip-add, decoder.rs:88 -- each saves a full-tensor XLA pass)."""
    skip_refs = [r.at[0] for r in refs[:n_skips]]
    o_ref, acc_ref = refs[n_skips], refs[n_skips + 1]
    x0_ref, x1_ref = x0_ref.at[0], x1_ref.at[0]
    o_ref = o_ref.at[0]
    W = x0_ref.shape[1]
    cin = x0_ref.shape[2]
    cout = o_ref.shape[2]
    zcol = jnp.zeros((rows, 1, cin), x0_ref.dtype)
    relu = (lambda t: jnp.maximum(t, jnp.zeros((), t.dtype))) if relu_in else (lambda t: t)

    # Row tap u covers padded rows [i*R+u, i*R+u+R): rows [u, R) of x0 plus
    # rows [0, u) of x1.  Rather than concatenating them (a VMEM copy of
    # the whole tile per tap), matmul the two row runs separately and add
    # each into the right rows of a VMEM scratch accumulator.
    acc_ref[:] = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                                  (rows * W, cout))

    # NOTE: the ReLU is deliberately applied per tap on a fresh ref read.
    # Hoisting `x0 = relu(x0_ref[:])` before the tap loop (read + ReLU
    # once, slice the value nine times) looks strictly cheaper but
    # MATERIALISES the whole block as a Mosaic stack value: measured
    # 20.84 MB scoped-VMEM (4.84 over the 16 MB limit) at the admitted
    # bf16 rows=4 768^2 x 256 config -- a compile failure, not a win. The
    # per-tap ref reads are what keep the admission gate's arithmetic true.
    def tap(tile, u, v, out_row0):
        r = tile.shape[0]
        tile = relu(tile)
        if v == 0:
            sh = jnp.concatenate([zcol[:r], tile[:, :-1]], axis=1)
        elif v == 2:
            sh = jnp.concatenate([tile[:, 1:], zcol[:r]], axis=1)
        else:
            sh = tile
        part = jax.lax.dot_general(
            sh.reshape(r * W, cin), w_ref[u, v],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Half inputs pin DEFAULT: in-kernel dots inherit the GLOBAL
            # matmul precision at trace time, and Mosaic rejects bf16
            # inputs under HIGHEST ("Bad lhs type") -- which is what the
            # f32/mixed modes set process-wide (a bf16 dot has nothing to
            # gain from multi-pass decomposition anyway). f32 inputs keep
            # the inherited precision: the admitted small f32 shapes must
            # stay true-f32 under those modes (measured compiling fine).
            precision=(jax.lax.Precision.DEFAULT
                       if sh.dtype != jnp.float32 else None),
        )
        lo = out_row0 * W
        acc_ref[lo:lo + r * W] = acc_ref[lo:lo + r * W] + part

    for u in range(3):
        for v in range(3):
            if u < rows:  # at rows=2, the u=2 tap reads x1 only
                tap(x0_ref[u:], u, v, 0)
            if u > 0:
                tap(x1_ref[:u], u, v, rows - u)
    # rows beyond the true output height are garbage (they read zero pad
    # rows); the caller slices them off, so just write them.
    y = acc_ref[:].reshape(rows, W, cout)
    for s_ref in skip_refs:
        y = y + s_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)




def _pick_rows(W: int, cin: int, cout: int, itemsize: int,
               n_skips: int) -> int | None:
    """Largest row-block size whose REAL scoped-VMEM footprint fits,
    calibrated by on-chip compile probes (scripts/probe_conv_vmem.py).
    None if even rows=2 does not fit (the caller falls back to XLA's conv).

    What the probes taught (v5e, measured at production H -- the real
    allocation grows with the GRID LENGTH, not just the block shapes; the
    same f32 rows=2 config compiles at H=4 but allocates 21.6 MB at
    H=768):

    * the structural estimate below (double-buffered streams + weights +
      accumulator, x0/x1 over-counted as two full R-row blocks to absorb
      Mosaic's unmodelled temporaries) with a 14 MB budget matches the
      bf16 frontier: bf16 @ 768x256 rows=8 really allocates 19.4 MB
      (reject), rows=4 compiles (admit);
    * ONE skip stream is nearly free in the real allocation (+0.11 MB
      measured at rows=8), so when the no-skip sizing picks rows=4 the
      single-skip config keeps it (probe-validated: bf16 768x256 rows=4
      n_skips=1 compiles; n_skips=2 does NOT -- 16.39 MB);
    * f32 does not fit at ANY probed (rows, 768x256) config (21.6-65 MB),
      and its allocation is not a 2x scaling of bf16's, so 4-byte dtypes
      are admitted only far from the frontier (W*C <= 48K elements, e.g.
      the FOV-head scale) -- larger f32 convs take XLA's lowering, which
      is fine: f32 runs are parity/diagnostic paths, not production.
    """
    if itemsize >= 4 and W * max(cin, cout) > 48 * 1024:
        return None

    def vmem_bytes(r, skips):
        return (2 * 2 * r * W * cin * itemsize        # x0/x1, double-buffered
                + 2 * r * W * cout * itemsize         # out
                + skips * 2 * r * W * cout * itemsize
                + r * W * cout * 4                    # f32 accumulator
                + 9 * cin * cout * itemsize + 2 * cout * itemsize)

    def pick(skips):
        for r in (8, 4, 2):
            if vmem_bytes(r, skips) <= 14 * 1024 * 1024:
                return r
        return None

    r = pick(n_skips)
    # The single-skip rows=4 admission is probe-validated only at the
    # bf16 768x256 config; extend it exactly to shapes that config
    # DOMINATES elementwise (every footprint term monotonically smaller).
    # Near-frontier shapes outside that envelope (e.g. W~780 from a
    # non-default ModelConfig) keep the conservative structural pick --
    # over-admitting there risks a runtime scoped-VMEM compile error that
    # conv3x3_supported claimed could not happen.
    if (n_skips == 1 and itemsize <= 2 and pick(0) == 4 and (r or 0) < 4
            and W <= 768 and cin <= 256 and cout <= 256):
        r = 4  # single skip measured ~free at the rows=4 class (see above)
    return r


def conv3x3_supported(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                      padding: int, n_skips: int = 0) -> bool:
    if stride != 1 or padding != 1 or w.ndim != 4 or w.shape[:2] != (3, 3):
        return False
    if x.ndim != 4:
        return False
    if jnp.dtype(x.dtype) == jnp.float16:
        return False  # Mosaic has no f16
    _, H, W, Cin = x.shape
    cout = w.shape[3]
    if not (Cin % 128 == 0 and cout % 128 == 0 and W % 8 == 0 and H >= 8):
        return False
    # f32 at the decoder's largest shapes can exceed scoped VMEM even at
    # the smallest row block; fall back to XLA's conv there.
    return _pick_rows(W, Cin, cout, jnp.dtype(x.dtype).itemsize, n_skips) is not None


@functools.partial(jax.jit, static_argnames=("relu_in", "interpret", "rows"))
def conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
                   skip: jnp.ndarray | None = None,
                   skip2: jnp.ndarray | None = None, relu_in: bool = False,
                   interpret: bool = False, rows: int | None = None) -> jnp.ndarray:
    """x: (B, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; stride 1, pad 1.

    ``relu_in``: apply ReLU to x inside the kernel; ``skip``/``skip2``:
    optional (B, H, W, Cout) residuals added to the output. ``rows``
    overrides the row-block size (even, for on-chip VMEM-frontier probing
    only -- can produce a scoped-VMEM compile error; production callers
    leave it None)."""
    if skip is None and skip2 is not None:
        skip, skip2 = skip2, None
    B, H, W, Cin = x.shape
    cout = w.shape[3]
    dt = x.dtype
    if b is None:
        b = jnp.zeros((cout,), dt)

    # (A fixed row-block size was measured 17 KB over the scoped-VMEM
    # limit once the skip stream was added at 768^2 x 256 -- size from the
    # explicit footprint estimate instead.)
    if rows is None:
        rows = _pick_rows(W, Cin, cout, jnp.dtype(dt).itemsize,
                          (skip is not None) + (skip2 is not None))
    elif rows % 2:
        raise ValueError(f"rows override must be even, got {rows}")
    if rows is None:
        raise ValueError(
            f"conv3x3_pallas does not fit VMEM at W={W} Cin={Cin} "
            f"Cout={cout} dtype={dt}; gate with conv3x3_supported/"
            f"conv3x3_dispatch (which check this) and use nn.conv2d")
    n_blocks = -(-H // rows)  # cdiv over output rows
    # padded rows: 1 top halo; bottom so the 2-row halo block exists for
    # every i (padded row count n_blocks*rows + 2, even since rows is)
    pad_bottom = n_blocks * rows + 1 - H
    xp = jnp.pad(x, ((0, 0), (1, pad_bottom), (0, 0), (0, 0)))

    spec0 = pl.BlockSpec((1, rows, W, Cin), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM)
    # The taps read at most 2 rows past the block (x1_ref[:u], u <= 2), so
    # the halo stream is a 2-row block at padded rows [i*rows+rows, +2):
    # block index (i*rows + rows)/2 in units of 2-row blocks.
    spec1 = pl.BlockSpec((1, 2, W, Cin),
                         lambda bb, i, r=rows: (bb, (i * r + r) // 2, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((3, 3, Cin, cout), lambda bb, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, cout), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM)

    ospec = pl.BlockSpec((1, rows, W, cout), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [spec0, spec1, wspec, bspec]
    inputs = [xp, xp, w, b.reshape(1, cout)]
    for s in (skip, skip2):
        if s is not None:
            in_specs.append(ospec)
            inputs.append(jnp.pad(
                s, ((0, 0), (0, n_blocks * rows - H), (0, 0), (0, 0))))

    kernel = functools.partial(
        _conv3x3_kernel, rows=rows, relu_in=relu_in,
        n_skips=(skip is not None) + (skip2 is not None))
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, n_blocks * rows, W, cout), dt),
        scratch_shapes=[pltpu.VMEM((rows * W, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Cin * cout * 9,
            bytes_accessed=B * (2 * H * W * Cin + H * W * cout) * jnp.dtype(dt).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:, :H]


def conv3x3_dispatch(x: jnp.ndarray, w: jnp.ndarray, b=None, skip=None,
                     skip2=None, relu_in: bool = False):
    """Run the Pallas conv if the environment allows it, else return None
    (the caller falls back to XLA's conv). Shared by nn.conv2d and the
    decoder's fused RCU path.

    A pallas_call is an opaque custom call to the GSPMD partitioner, so:

    * outside any sharded context the kernel runs plainly, single chip
      only (on a multi-chip runtime without a mesh context we cannot know
      how the surrounding computation is partitioned);
    * inside a ``patch_sharded`` mesh whose data axis divides the batch,
      the kernel is shard_mapped over the batch. Any model axis is left
      unmapped: the conv decoder/head parameters are replicated over
      ``model`` (parallel.sharding.param_specs), so each model-group
      device computes the same per-data-shard conv -- exactly the
      replicated lowering GSPMD would pick, but through the kernel;
    * non-dividing batches -> None.
    """
    import os

    # value-based like every MATRIX_EYES_* flag ("" and "0" mean unset) --
    # and identical to what the AOT cache salts on (aot.py), so a cached
    # program can never disagree with the dispatch decision
    if os.environ.get("MATRIX_EYES_NO_PALLAS_CONV", "") not in ("", "0"):
        return None
    if jax.default_backend() != "tpu":
        return None
    n_skips = (skip is not None) + (skip2 is not None)
    if not conv3x3_supported(x, w, 1, 1, n_skips):
        return None

    from matrix_eyes_tpu.parallel.sharding import active_patch_context

    ctx = active_patch_context()
    if ctx is None:
        if len(jax.devices()) != 1:
            return None
        return conv3x3_pallas(x, w, b, skip=skip, skip2=skip2, relu_in=relu_in)

    mesh, axis = ctx
    if x.shape[0] % mesh.shape[axis] != 0:
        return None

    from jax.sharding import PartitionSpec as P

    from matrix_eyes_tpu.parallel.compat import shard_map

    batch_spec = P(axis, None, None, None)
    has_b, has_s, has_s2 = b is not None, skip is not None, skip2 is not None
    operands = [x, w]
    specs = [batch_spec, P()]
    for present, val, spec in ((has_b, b, P()), (has_s, skip, batch_spec),
                               (has_s2, skip2, batch_spec)):
        if present:
            operands.append(val)
            specs.append(spec)

    def fn(*ops):
        i = 2
        bb = ops[i] if has_b else None
        i += has_b
        ss = ops[i] if has_s else None
        i += has_s
        ss2 = ops[i] if has_s2 else None
        return conv3x3_pallas(ops[0], ops[1], bb, skip=ss, skip2=ss2,
                              relu_in=relu_in)

    return shard_map(fn, mesh=mesh, in_specs=tuple(specs),
                     out_specs=batch_spec, check_rep=False)(*operands)
