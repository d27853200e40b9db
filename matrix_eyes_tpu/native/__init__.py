"""Native (C++) host-side runtime pieces.

The reference is a fully native binary; here the device path is XLA/Pallas
(which compiles to native TPU code) and the host-side serialisation hot
spot -- OBJ ASCII writing at millions of vertices -- is a C++ extension,
built on demand with the system toolchain and loaded via ctypes (no
pybind11 dependency). Falls back to pure Python transparently.
"""

from matrix_eyes_tpu.native.meshwriter import format_f64_native, write_obj  # noqa: F401  (re-exports)

__all__ = ["format_f64_native", "write_obj"]
