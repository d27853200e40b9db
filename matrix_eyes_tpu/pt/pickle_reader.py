"""Minimal reader for PyTorch zip-format checkpoints, without torch.

A modern ``torch.save`` file is a zip archive::

    <name>/data.pkl      -- pickle of the object graph; tensors are
                            persistent-id references to storages
    <name>/data/<key>    -- raw little-endian storage bytes
    <name>/version

The pickle stream references torch classes; we substitute minimal stand-ins
via ``Unpickler.find_class`` and materialise tensors as numpy arrays
(bfloat16 via ml_dtypes). Only what a state_dict needs is implemented --
any other global is rejected, which also keeps unpickling safe.

Replaces the reference's burn-store PytorchStore (mod.rs:229-243).
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np
import ml_dtypes

from matrix_eyes_tpu.errors import LoaderError

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "BFloat16Storage": np.dtype(ml_dtypes.bfloat16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name


class _Storage:
    """Lazily-read storage: bytes come out of the zip on first use."""

    def __init__(self, zf: zipfile.ZipFile, member: str, dtype: np.dtype, numel: int):
        self.zf = zf
        self.member = member
        self.dtype = dtype
        self.numel = numel
        self._data: np.ndarray | None = None

    def data(self) -> np.ndarray:
        if self._data is None:
            try:
                raw = self.zf.read(self.member)
            except KeyError as e:
                raise LoaderError(f"checkpoint storage missing: {self.member}") from e
            if len(raw) < self.numel * self.dtype.itemsize:
                raise LoaderError(
                    f"checkpoint storage {self.member} truncated: "
                    f"{len(raw)} bytes < {self.numel} x {self.dtype}")
            self._data = np.frombuffer(raw, dtype=self.dtype, count=self.numel)
        return self._data


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    flat = storage.data()
    # The offset/size/stride triplet comes straight out of the (untrusted)
    # pickle stream; validate that the strided view stays inside the storage
    # buffer before as_strided, which performs no bounds checks of its own --
    # a malformed checkpoint must produce a LoaderError, not an out-of-bounds
    # read of process memory.
    try:
        offset = int(storage_offset)
        shape = tuple(int(s) for s in size)
        strides = tuple(int(s) for s in stride)
    except (TypeError, ValueError) as e:
        raise LoaderError(f"malformed tensor metadata in checkpoint: {e}") from e
    if offset < 0 or any(s < 0 for s in shape) or any(s < 0 for s in strides) \
            or len(shape) != len(strides):
        raise LoaderError(
            f"malformed tensor metadata in checkpoint: offset={offset} "
            f"size={shape} stride={strides}")
    if not shape:
        if offset >= flat.size:
            raise LoaderError(
                f"tensor offset {offset} out of storage bounds ({flat.size})")
        return flat[offset].copy().reshape(())
    if any(s == 0 for s in shape):
        return np.empty(shape, flat.dtype)
    last = offset + sum((d - 1) * s for d, s in zip(shape, strides))
    if last >= flat.size:
        raise LoaderError(
            f"tensor view (offset={offset} size={shape} stride={strides}) "
            f"exceeds storage bounds ({flat.size} elements)")
    itemsize = flat.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        flat[offset:],
        shape=shape,
        strides=tuple(s * itemsize for s in strides),
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(tensor, requires_grad=True, backward_hooks=None):
    return tensor


class _AttrDict(dict):
    """dict that tolerates the OrderedDict pickle protocol (BUILD sets
    instance attributes like ``_metadata``)."""


_SAFE_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): _AttrDict,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file: BinaryIO, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self.zf = zf
        self.prefix = prefix

    def find_class(self, module: str, name: str) -> Any:
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        raise pickle.UnpicklingError(
            f"unsupported global in checkpoint pickle: {module}.{name}")

    def persistent_load(self, pid: Any) -> _Storage:
        if not (isinstance(pid, tuple) and len(pid) >= 5 and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        _, storage_type, key, _location, numel = pid[:5]
        if isinstance(storage_type, _StorageType):
            dtype = _STORAGE_DTYPES[storage_type.name]
        else:
            raise pickle.UnpicklingError(f"unsupported storage type: {storage_type!r}")
        member = f"{self.prefix}/data/{key}"
        return _Storage(self.zf, member, dtype, numel)


def _flatten(obj: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(v, f"{prefix}.{k}" if prefix else str(k), out)
    elif isinstance(obj, np.ndarray):
        out[prefix] = obj
    # non-tensor metadata entries (e.g. ints) are dropped


def read_pt_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a PyTorch zip checkpoint into a flat {key: numpy array} dict.

    Handles both a bare state_dict and common wrappers like
    {'state_dict': ...} or {'model': ...} (one level deep).
    """
    try:
        zf = zipfile.ZipFile(path)
    except (zipfile.BadZipFile, OSError) as e:
        raise LoaderError(f"PyTorch store error: {path}: {e}") from e
    with zf:
        pkl_members = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_members:
            raise LoaderError(
                f"PyTorch store error: {path}: no data.pkl (legacy non-zip "
                "checkpoints are not supported)")
        prefix = pkl_members[0][: -len("/data.pkl")]
        with zf.open(pkl_members[0]) as f:
            try:
                obj = _Unpickler(f, zf, prefix).load()
            except pickle.UnpicklingError as e:
                raise LoaderError(f"PyTorch store error: {path}: {e}") from e
        if isinstance(obj, dict):
            for wrapper in ("state_dict", "model"):
                if wrapper in obj and isinstance(obj[wrapper], dict) and not isinstance(
                        obj[wrapper], np.ndarray):
                    inner = obj[wrapper]
                    if any(isinstance(v, np.ndarray) for v in inner.values()):
                        obj = inner
                        break
        flat: Dict[str, np.ndarray] = {}
        _flatten(obj, "", flat)
        if not flat:
            raise LoaderError(f"PyTorch store error: {path}: no tensors found")
        return flat
