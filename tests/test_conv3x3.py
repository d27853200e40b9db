"""Pallas 3x3 shifted-matmul conv kernel vs the XLA conv (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from matrix_eyes_tpu.ops import nn
from matrix_eyes_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_supported


@pytest.fixture(autouse=True)
def _reference_takes_xla_path(monkeypatch):
    # On a real TPU backend nn.conv2d would dispatch back into the Pallas
    # kernel, making the kernel-vs-XLA comparison self-referential; pin the
    # reference to the XLA path.
    monkeypatch.setenv("MATRIX_EYES_NO_PALLAS_CONV", "1")


@pytest.mark.parametrize("shape", [
    (1, 16, 16, 128, 128),   # minimal lanes
    (1, 12, 16, 128, 256),   # H not a multiple of the row block
    (3, 8, 24, 256, 128),    # batched (the throughput config)
])
def test_conv3x3_matches_xla(shape):
    B, H, W, Cin, Cout = shape
    rng = np.random.RandomState(sum(shape))
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, Cin, Cout)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.5, 0.5, (Cout,)).astype(np.float32))
    assert conv3x3_supported(x, w, 1, 1)
    want = nn.conv2d(x, w, b, stride=1, padding=1)
    got = conv3x3_pallas(x, w, b, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_relu_in_and_skip():
    # fused RCU form: relu inside the kernel, residual on the output
    H, W, Cin = 12, 16, 128
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(-1, 1, (1, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, Cin, Cin)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.5, 0.5, (Cin,)).astype(np.float32))
    skip = jnp.asarray(rng.uniform(-1, 1, (1, H, W, Cin)).astype(np.float32))
    want = nn.conv2d(nn.relu(x), w, b, padding=1) + skip
    got = conv3x3_pallas(x, w, b, skip=skip, relu_in=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_rows2_path():
    # Full decoder width with two skip streams forces the rows=2 VMEM
    # sizing (probe-measured: bf16 rows=4 with two skips allocates
    # 16.39 MB on-chip); at rows=2 the u=2 row tap reads exclusively from
    # the second row block -- exercise that path via the rows override.
    from matrix_eyes_tpu.ops.conv3x3 import _pick_rows

    assert _pick_rows(768, 256, 256, 2, n_skips=2) == 2
    H, W, Cin = 4, 768, 128
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.1, 0.1, (3, 3, Cin, Cin)).astype(np.float32))
    skip = jnp.asarray(rng.uniform(-1, 1, (1, H, W, Cin)).astype(np.float32))
    want = nn.conv2d(nn.relu(x), w, padding=1) + skip + 2.0 * skip
    got = conv3x3_pallas(x, w, None, skip=skip, skip2=2.0 * skip,
                         relu_in=True, interpret=True, rows=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_single_skip_keeps_rows4():
    # ONE skip stream is measured ~free in the real allocation: the
    # single-skip RCU conv at the decoder's hot shape keeps the rows=4
    # sizing of the skipless conv (probe-validated on-chip).
    from matrix_eyes_tpu.ops.conv3x3 import _pick_rows

    assert _pick_rows(768, 256, 256, 2, n_skips=0) == 4
    assert _pick_rows(768, 256, 256, 2, n_skips=1) == 4
    assert _pick_rows(768, 256, 256, 2, n_skips=2) == 2


def test_conv3x3_vmem_gate_rejects_oversize_f32():
    # f32 at the decoder's shapes does not fit scoped VMEM at any probed
    # row count (21.6-65 MB real allocations measured on-chip): the gate
    # must say no (XLA fallback) and the kernel must refuse loudly rather
    # than OOM on-chip. Small f32 shapes (FOV-head scale) stay admitted.
    from matrix_eyes_tpu.ops.conv3x3 import _pick_rows

    assert _pick_rows(768, 256, 256, 4, n_skips=1) is None
    assert _pick_rows(768, 256, 256, 4, n_skips=0) is None  # the measured 21.6 MB OOM
    assert _pick_rows(768, 128, 128, 4, n_skips=0) is None  # unprobed near-frontier
    assert _pick_rows(128, 128, 128, 4, n_skips=0) is not None  # small f32 ok
    x = jnp.zeros((1, 8, 768, 256), jnp.float32)
    w = jnp.zeros((3, 3, 256, 256), jnp.float32)
    assert not conv3x3_supported(x, w, 1, 1, n_skips=1)
    assert conv3x3_supported(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                             1, 1, n_skips=1)
    with pytest.raises(ValueError, match="VMEM"):
        conv3x3_pallas(x, w, None, skip=jnp.zeros((1, 8, 768, 256), jnp.float32),
                       interpret=True)


@pytest.mark.parametrize("rows", [2, 4, 8])
def test_conv3x3_rows_override_halo(rows):
    # The halo stream is a 2-row block at padded rows [i*R+R, i*R+R+2);
    # exercise every row-block size across block boundaries (H spans
    # several blocks and is not a multiple of the block).
    H, W, Cin = 18, 16, 128
    rng = np.random.RandomState(rows)
    x = jnp.asarray(rng.uniform(-1, 1, (1, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, Cin, Cin)).astype(np.float32))
    want = nn.conv2d(x, w, stride=1, padding=1)
    got = conv3x3_pallas(x, w, interpret=True, rows=rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match="even"):
        conv3x3_pallas(x, w, interpret=True, rows=3)


def test_conv3x3_support_gate():
    x = jnp.zeros((1, 16, 16, 128))
    w = jnp.zeros((3, 3, 128, 128))
    assert conv3x3_supported(x, w, 1, 1)
    assert not conv3x3_supported(x, w, 2, 1)           # stride
    assert not conv3x3_supported(x, w, 1, 0)           # padding
    assert conv3x3_supported(jnp.zeros((2, 16, 16, 128)), w, 1, 1)  # batched ok
    assert not conv3x3_supported(jnp.zeros((1, 16, 16, 64)),
                                 jnp.zeros((3, 3, 64, 128)), 1, 1)      # lanes
    assert not conv3x3_supported(x.astype(jnp.float16), w, 1, 1)        # f16
