"""Output-layer tests: colormap, stereogram, mesh, formatting, writers."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from matrix_eyes_tpu.ops.colormap import map_depth, _LUT
from matrix_eyes_tpu.ops.resize import depthmap_bilinear_resample
from matrix_eyes_tpu.ops.stereogram import (
    reference_rows,
    stereogram_geometry,
    synthesize_stereogram,
)
from matrix_eyes_tpu.output.mesh import POLYGON_DEPTH_THRESHOLD, build_mesh
from matrix_eyes_tpu.output.rust_format import format_f64


# --- colormap ---------------------------------------------------------------

def _map_color_scalar(colormap, value):
    """Direct port of map_color (output.rs:703-714) for testing."""
    if value >= 1.0:
        return colormap[-1]
    step = np.float32(1.0 / 255.0)
    box = int(np.clip(math.floor(np.float32(value) / step), 0, 254))
    ratio = (np.float32(value) - step * np.float32(box)) / step
    c1, c2 = np.float32(colormap[box]), np.float32(colormap[box + 1])
    return int(np.floor(c2 * ratio + c1 * (1.0 - ratio) + 0.5))


def test_colormap_matches_scalar_reference():
    values = np.concatenate([
        np.linspace(0.0, 1.0, 257, dtype=np.float32),
        np.asarray([0.999999, 1.0, 1.5, 0.5000001], np.float32),
    ])
    got = np.asarray(map_depth(jnp.asarray(values)))
    for i, v in enumerate(values):
        for c in range(3):
            expected = _map_color_scalar(_LUT[:, c], float(v))
            assert got[i, c] == expected, (v, c, got[i, c], expected)


# --- stereogram -------------------------------------------------------------

def test_stereogram_geometry():
    # production-ish numbers: W=4032, amp=1/16 -> dm=252, pw=504
    dm, pw = stereogram_geometry(4032, 1.0 / 16.0)
    assert dm == 252.0
    assert pw == 504


def test_stereogram_matches_sequential_reference():
    rng = np.random.RandomState(0)
    H, W = 37, 101
    grid = rng.uniform(0.004, 10.0, size=(23, 29)).astype(np.float32)
    amplitude = 0.11
    dm, pw = stereogram_geometry(W, amplitude)

    out = np.asarray(synthesize_stereogram(jnp.asarray(grid), H, W, amplitude, seed=3))

    # rebuild inputs exactly as the kernel sees them
    sampled = np.asarray(depthmap_bilinear_resample(jnp.asarray(grid), H, W))
    dmin, dmax = grid.min(), grid.max()
    dnorm = (sampled - dmin) / (dmax - dmin)
    import jax

    noise = np.asarray(jax.random.randint(
        jax.random.PRNGKey(3), (H, max(pw, 1), 3), 0, 256, dtype=jnp.uint8))
    expected = reference_rows(dnorm, noise, pw, dm)
    np.testing.assert_array_equal(out, expected)


def test_stereogram_pattern_periodicity():
    # in flat-depth regions the pattern must repeat with period pw - shift
    grid = np.full((16, 16), 5.0, np.float32)
    H, W = 24, 200
    amplitude = 0.0625
    dm, pw = stereogram_geometry(W, amplitude)
    out = np.asarray(synthesize_stereogram(jnp.asarray(grid), H, W, amplitude, seed=1))
    # flat grid -> dnorm = 0 everywhere -> shift 0 -> period pw
    np.testing.assert_array_equal(out[:, pw : 2 * pw], out[:, :pw])


def test_stereogram_zero_amplitude():
    grid = np.full((8, 8), 1.0, np.float32)
    out = np.asarray(synthesize_stereogram(jnp.asarray(grid), 10, 20, 0.0, seed=0))
    assert out.shape == (10, 20, 3)


# --- depthmap bilinear sampler ---------------------------------------------

def test_depthmap_bilinear_matches_reference_sampler():
    # scalar port of interpolate_point (output.rs:83-98)
    def interpolate_point(data, x, y):
        h, w = data.shape
        xf = max(x * w, 0.0)
        yf = max(y * h, 0.0)
        x0 = min(int(math.floor(xf)), w - 1)
        y0 = min(int(math.floor(yf)), h - 1)
        x1 = min(x0 + 1, w - 1)
        y1 = min(y0 + 1, h - 1)
        fx = xf - math.floor(xf)
        fy = yf - math.floor(yf)
        return ((1 - fx) * (1 - fy) * data[y0, x0] + fx * (1 - fy) * data[y0, x1]
                + (1 - fx) * fy * data[y1, x0] + fx * fy * data[y1, x1])

    rng = np.random.RandomState(1)
    data = rng.uniform(0, 1, size=(9, 13)).astype(np.float32)
    out = np.asarray(depthmap_bilinear_resample(jnp.asarray(data), 21, 17))
    for yo in range(21):
        for xo in range(17):
            want = interpolate_point(data, xo / 17, yo / 21)
            assert abs(out[yo, xo] - want) < 1e-5


# --- mesh -------------------------------------------------------------------

def _brute_force_mesh(data):
    """Direct port of IndexedMesh::new + for_each_face (output.rs:272-355)."""
    H, W = data.shape
    faces = []
    for y in range(H - 1):
        for x in range(W - 1):
            i00, i10 = y * W + x, y * W + x + 1
            i01, i11 = (y + 1) * W + x, (y + 1) * W + x + 1
            v = data.reshape(-1)
            for idx in ([i00, i01, i10], [i10, i01, i11]):
                vals = [v[i] for i in idx]
                if max(vals) / min(vals) <= POLYGON_DEPTH_THRESHOLD:
                    faces.append(idx)
    index = {}
    for f in faces:
        for i in f:
            if i not in index:
                index[i] = len(index)
    remapped = [[index[i] for i in f] for f in faces]
    return index, remapped


def test_mesh_matches_brute_force():
    rng = np.random.RandomState(2)
    data = rng.uniform(0.9, 1.1, size=(12, 15)).astype(np.float32)
    mesh = build_mesh(data)
    index, remapped = _brute_force_mesh(data)
    assert mesh.nvertices == len(index)
    assert mesh.nfaces == len(remapped)
    # vertex ordering: orig index of new-vertex v
    inv = sorted(index, key=lambda k: index[k])
    np.testing.assert_array_equal(mesh.vertex_orig_indices, np.asarray(inv))
    np.testing.assert_array_equal(mesh.faces, np.asarray(remapped, np.int32))


def test_mesh_flat_grid_keeps_all_faces():
    data = np.full((5, 7), 2.0, np.float32)
    mesh = build_mesh(data)
    assert mesh.nfaces == 2 * 4 * 6
    assert mesh.nvertices == 5 * 7


# --- Rust float formatting --------------------------------------------------

@pytest.mark.parametrize("value,expected", [
    (1.0, "1"),
    (0.0, "0"),
    (-0.0, "-0"),
    (0.5, "0.5"),
    (-3.25, "-3.25"),
    (1e-7, "0.0000001"),
    (1.5e-7, "0.00000015"),
    (1e20, "100000000000000000000"),
    (123.456, "123.456"),
    (float(np.float32(0.1)), "0.10000000149011612"),
    (250.0, "250"),
])
def test_format_f64(value, expected):
    assert format_f64(value) == expected


def test_format_f64_roundtrip_random():
    rng = np.random.RandomState(3)
    for _ in range(500):
        v = float(rng.uniform(-250, 250) * 10 ** rng.randint(-8, 3))
        s = format_f64(v)
        assert "e" not in s and "E" not in s
        assert float(s) == v, (v, s)


def test_stereogram_seed_determinism():
    grid = jnp.asarray(np.random.RandomState(7).uniform(0.1, 5, (16, 16)).astype(np.float32))
    a = np.asarray(synthesize_stereogram(grid, 20, 50, 0.1, seed=42))
    b = np.asarray(synthesize_stereogram(grid, 20, 50, 0.1, seed=42))
    c = np.asarray(synthesize_stereogram(grid, 20, 50, 0.1, seed=43))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_stereogram_pathological_subpixel_amplitude():
    # dm ~ 0.5 makes max_shift == pw: pixels can link to themselves, and the
    # reference then keeps their initial full-width noise value
    # (output_row = noise_row.clone(), output.rs:172). W=50, amp=0.01 ->
    # dm=0.5, pw=1, max_shift=1.
    import jax

    H, W, amplitude = 9, 50, 0.01
    dm, pw = stereogram_geometry(W, amplitude)
    assert pw == 1 and math.floor(dm + 0.5) == pw  # the pathological regime
    rng = np.random.RandomState(4)
    grid = rng.uniform(0.004, 10.0, size=(7, 8)).astype(np.float32)

    out = np.asarray(synthesize_stereogram(jnp.asarray(grid), H, W, amplitude, seed=9))

    sampled = np.asarray(depthmap_bilinear_resample(jnp.asarray(grid), H, W))
    dnorm = (sampled - grid.min()) / (grid.max() - grid.min())
    noise = np.asarray(jax.random.randint(
        jax.random.PRNGKey(9), (H, W, 3), 0, 256, dtype=jnp.uint8))
    expected = reference_rows(dnorm, noise, pw, dm)
    np.testing.assert_array_equal(out, expected)
