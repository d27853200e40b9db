"""Output layer: depth-map rendering, stereogram driver, mesh export.

The device-side compute (colormap LUT, stereogram chain resolution, resizes,
face-mask/vertex math) lives in ops/ and runs under jit; this package owns
the host-side containers and file serialisation (PNG/JPEG via PIL, OBJ/PLY
writers with a native C++ fast path).
"""

from matrix_eyes_tpu.output.depthmap import DepthMap, ImageOutputFormat, VertexMode

__all__ = ["DepthMap", "ImageOutputFormat", "VertexMode"]
