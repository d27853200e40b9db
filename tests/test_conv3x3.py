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
    # sizing (the configuration class that OOM'd scoped vmem at a fixed
    # row count); at rows=2 the u=2 row tap reads exclusively from the
    # second row block.
    from matrix_eyes_tpu.ops.conv3x3 import _pick_rows

    H, W, Cin = 4, 768, 128
    assert _pick_rows(W, Cin, Cin, 4, n_skips=2) == 2
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.1, 0.1, (3, 3, Cin, Cin)).astype(np.float32))
    skip = jnp.asarray(rng.uniform(-1, 1, (1, H, W, Cin)).astype(np.float32))
    want = nn.conv2d(nn.relu(x), w, padding=1) + skip + 2.0 * skip
    got = conv3x3_pallas(x, w, None, skip=skip, skip2=2.0 * skip,
                         relu_in=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_vmem_gate_rejects_oversize_f32():
    # f32 at the decoder's largest shape with the RCU's skip streams does
    # not fit scoped VMEM at any row count: the gate must say no (XLA
    # fallback) and the kernel must refuse loudly rather than OOM on-chip.
    from matrix_eyes_tpu.ops.conv3x3 import _pick_rows

    assert _pick_rows(768, 256, 256, 4, n_skips=1) is None
    x = jnp.zeros((1, 8, 768, 256), jnp.float32)
    w = jnp.zeros((3, 3, 256, 256), jnp.float32)
    assert not conv3x3_supported(x, w, 1, 1, n_skips=1)
    assert conv3x3_supported(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                             1, 1, n_skips=1)
    with pytest.raises(ValueError, match="VMEM"):
        conv3x3_pallas(x, w, None, skip=jnp.zeros((1, 8, 768, 256), jnp.float32),
                       interpret=True)


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
