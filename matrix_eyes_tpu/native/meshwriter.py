"""ctypes loader/builder for the native OBJ serializer (meshwriter.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "meshwriter.cpp")
_LIB_NAME = "libmeshwriter.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build_dir() -> str:
    d = os.environ.get("MATRIX_EYES_NATIVE_DIR")
    if d:
        return d
    cache = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(cache, "matrix-eyes-tpu")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        lib_path = os.path.join(_build_dir(), _LIB_NAME)
        try:
            if (not os.path.exists(lib_path)
                    or os.path.getmtime(lib_path) < os.path.getmtime(_SRC)):
                os.makedirs(os.path.dirname(lib_path), exist_ok=True)
                with tempfile.NamedTemporaryFile(
                        suffix=".so", dir=os.path.dirname(lib_path), delete=False) as tmp:
                    tmp_path = tmp.name
                subprocess.run(
                    ["g++", "-std=c++17", "-O2", "-shared", "-fPIC",
                     _SRC, "-o", tmp_path],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp_path, lib_path)
            lib = ctypes.CDLL(lib_path)
            lib.me_write_obj.restype = ctypes.c_int
            lib.me_write_obj.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_void_p,  # rgb or NULL
                ctypes.c_void_p, ctypes.c_void_p,  # us, vs or NULL
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int, ctypes.c_char_p,
            ]
            lib.me_format_f64.restype = ctypes.c_int
            lib.me_format_f64.argtypes = [ctypes.c_double, ctypes.c_char_p]
            lib.me_index_mesh.restype = ctypes.c_int64
            lib.me_index_mesh.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
            return _lib
        except (OSError, subprocess.SubprocessError):
            _build_failed = True
            return None


def available() -> bool:
    return _load() is not None


def format_f64_native(v: float) -> Optional[str]:
    """Native shortest-round-trip positional formatting (for tests)."""
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(512)
    n = lib.me_format_f64(ctypes.c_double(v), buf)
    return buf.raw[:n].decode()


def index_mesh(faces: np.ndarray, grid_size: int):
    """First-use vertex indexing (see me_index_mesh). faces: (nf, 3) int64.
    Returns (vertex_orig int64 (nv,), remapped_faces int32 (nf, 3)) or None
    if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int64)
    nf = faces.shape[0]
    out_faces = np.empty((nf, 3), np.int32)
    out_vertex = np.empty(min(3 * nf, grid_size), np.int64)
    nv = lib.me_index_mesh(
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(nf), ctypes.c_int64(grid_size),
        out_faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_vertex.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if nv < 0:
        raise ValueError("face index out of range in index_mesh")
    return out_vertex[:nv].copy(), out_faces


def write_obj(path, x, y, z, rgb, uvs, faces, texture: bool, mtl_stem: str) -> bool:
    """Write the OBJ via the native library. Returns False if unavailable
    (caller falls back to Python). Arrays: x/y/z f64 (nv,), rgb u8 (nv,3)
    or None, uvs (u, v) f32 or None, faces i32 (nf, 3) 0-based."""
    lib = _load()
    if lib is None:
        return False
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    z = np.ascontiguousarray(z, np.float64)
    faces = np.ascontiguousarray(faces, np.int32)
    nv = x.shape[0]
    nf = faces.shape[0]
    rgb_p = None
    if rgb is not None:
        rgb = np.ascontiguousarray(rgb, np.uint8)
        rgb_p = rgb.ctypes.data_as(ctypes.c_void_p)
    us_p = vs_p = None
    if uvs is not None:
        us = np.ascontiguousarray(uvs[0], np.float32)
        vs = np.ascontiguousarray(uvs[1], np.float32)
        us_p = us.ctypes.data_as(ctypes.c_void_p)
        vs_p = vs.ctypes.data_as(ctypes.c_void_p)
    rc = lib.me_write_obj(
        path.encode(),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(nv),
        rgb_p, us_p, vs_p,
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(nf),
        ctypes.c_int(1 if texture else 0),
        mtl_stem.encode(),
    )
    if rc != 0:
        raise OSError(f"native OBJ writer failed with code {rc} for {path}")
    return True
