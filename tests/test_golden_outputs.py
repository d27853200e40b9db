"""Byte-exact golden regression tests for the mesh writers.

The structural tests (test_outputs.py, test_native_writer.py) verify the
algorithms against brute-force ports; these freeze the exact bytes so
format drift (float formatting, ordering, headers) is caught immediately.
"""

import hashlib
import os

import numpy as np
import pytest

from matrix_eyes_tpu.output import writers
from matrix_eyes_tpu.output.mesh import build_mesh

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

DATA = np.array([
    [1.00, 1.01, 1.02, 1.50],
    [1.01, 1.02, 1.03, 1.52],
    [1.02, 1.03, 1.04, 1.54],
], dtype=np.float32)
IMG = (np.arange(3 * 4 * 3).reshape(3, 4, 3) * 7 % 256).astype(np.uint8)
ORIGINAL_SIZE = (8, 6)
PLY_PLAIN_SHA256 = "b56f95439aa784c75d6d11157812f9d7bbacae87bf2e73362f7b0221a69fbb32"


@pytest.fixture(scope="module")
def mesh():
    m = build_mesh(DATA)
    # faces touching the 1.5x column exceed the 1.025 ratio and are dropped
    assert (m.nvertices, m.nfaces) == (9, 8)
    return m


@pytest.mark.parametrize("use_native", [False, True])
def test_obj_vertex_colors_golden(mesh, tmp_path, use_native):
    out = str(tmp_path / "golden.obj")
    writers.write_obj(out, mesh, DATA, ORIGINAL_SIZE, "vertex-colors", IMG,
                      use_native=use_native)
    want = open(os.path.join(GOLDEN_DIR, "golden.obj")).read()
    assert open(out).read() == want


@pytest.mark.parametrize("use_native", [False, True])
def test_obj_texture_golden(mesh, tmp_path, use_native):
    out = str(tmp_path / "golden_tex.obj")
    writers.write_obj(out, mesh, DATA, ORIGINAL_SIZE, "texture-coordinates",
                      None, source_image_path="s.jpg", use_native=use_native)
    want = open(os.path.join(GOLDEN_DIR, "golden_tex.obj")).read()
    assert open(out).read() == want
    mtl = open(str(tmp_path / "golden_tex.mtl")).read()
    assert mtl.startswith("newmtl Textured\n")


def test_ply_plain_golden(mesh, tmp_path):
    out = str(tmp_path / "golden.ply")
    writers.write_ply(out, mesh, DATA, ORIGINAL_SIZE, "plain")
    raw = open(out, "rb").read()
    assert len(raw) == 520
    assert hashlib.sha256(raw).hexdigest() == PLY_PLAIN_SHA256
