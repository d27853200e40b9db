"""Native C++ OBJ serializer: byte-identical to the Python reference path."""

import numpy as np
import pytest

from matrix_eyes_tpu.native import meshwriter
from matrix_eyes_tpu.output import writers
from matrix_eyes_tpu.output.mesh import build_mesh
from matrix_eyes_tpu.output.rust_format import format_f64

pytestmark = pytest.mark.skipif(
    not meshwriter.available(), reason="native toolchain unavailable")


def test_native_format_f64_matches_python():
    rng = np.random.RandomState(0)
    values = [1.0, 0.0, -0.0, 0.5, -3.25, 1e-7, 1.5e-7, 123.456, 250.0,
              float(np.float32(0.1)), 1e20,
              float("nan"), float("inf"), float("-inf")]
    values += [float(rng.uniform(-250, 250) * 10 ** rng.randint(-9, 3))
               for _ in range(2000)]
    for v in values:
        got = meshwriter.format_f64_native(v)
        want = format_f64(v)
        assert got == want, (v, got, want)


def _files_equal(a, b):
    return open(a, "rb").read() == open(b, "rb").read()


@pytest.mark.parametrize("mode,with_img", [
    ("plain", False), ("vertex-colors", True), ("texture-coordinates", False),
])
def test_native_obj_matches_python(tmp_path, mode, with_img):
    rng = np.random.RandomState(1)
    data = rng.uniform(0.9, 1.12, size=(20, 24)).astype(np.float32)
    mesh = build_mesh(data)
    assert mesh.nfaces > 0
    img = rng.randint(0, 256, size=(20, 24, 3), dtype=np.uint8) if with_img else None
    py_path = str(tmp_path / "py.obj")
    nat_path = str(tmp_path / "nat.obj")
    writers.write_obj(py_path, mesh, data, (24, 20), mode, img,
                      source_image_path="src.jpg", use_native=False)
    writers.write_obj(nat_path, mesh, data, (24, 20), mode, img,
                      source_image_path="src.jpg", use_native=True)
    py = open(py_path).read()
    nat = open(nat_path).read()
    # the mtllib stem differs by file name; normalise it
    py = py.replace("mtllib py.mtl", "mtllib X.mtl")
    nat = nat.replace("mtllib nat.mtl", "mtllib X.mtl")
    assert py == nat


def test_native_index_mesh_matches_numpy():
    from matrix_eyes_tpu.output import mesh as mesh_mod

    rng = np.random.RandomState(9)
    data = rng.uniform(0.9, 1.15, size=(40, 37)).astype(np.float32)
    native = mesh_mod.build_mesh(data)

    # force the numpy path
    import unittest.mock as mock

    with mock.patch.object(meshwriter, "_load", return_value=None):
        numpy_mesh = mesh_mod.build_mesh(data)

    np.testing.assert_array_equal(native.vertex_orig_indices,
                                  numpy_mesh.vertex_orig_indices)
    np.testing.assert_array_equal(native.faces, numpy_mesh.faces)
