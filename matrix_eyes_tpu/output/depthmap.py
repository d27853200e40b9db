"""DepthMap container and output dispatch (reference output.rs:19-262).

Unlike the reference -- which pulls the whole tensor to the host immediately
(output.rs:54) and post-processes on CPU -- the depth map stays device-
resident: clamping, min/max, colormap, stereogram chain resolution and
resampling all run under jit; the host sees pixels only at file-encode time.

Clamp range: inverse depth in [1/250, 1/0.1] (CLIP_DEPTH_RANGE,
output.rs:40-51).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from matrix_eyes_tpu.errors import OutputError
from matrix_eyes_tpu.ops.colormap import map_depth
from matrix_eyes_tpu.ops.resize import resize_lanczos3, to_u8
from matrix_eyes_tpu.ops.stereogram import synthesize_stereogram

CLIP_DEPTH_MIN = 0.1
CLIP_DEPTH_MAX = 250.0


class ImageOutputFormat(enum.Enum):
    DEPTH_MAP = "depthmap"
    STEREOGRAM = "stereogram"


class VertexMode(enum.Enum):
    PLAIN = "plain"
    COLOR = "vertex-colors"
    TEXTURE = "texture-coordinates"


@partial(jax.jit, static_argnames=())
def _clamp_inverse_depth(inverse_depth: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.float32(1.0 / CLIP_DEPTH_MAX)
    hi = jnp.float32(1.0 / CLIP_DEPTH_MIN)
    return jnp.clip(inverse_depth.astype(jnp.float32), lo, hi)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _render_depth_map(data: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Normalise (near = bright), colour via the viridis LUT, Lanczos3-resize
    to the original size (output.rs:123-139)."""
    dmin = jnp.min(data)
    dmax = jnp.max(data)
    denom = dmax - dmin
    value = jnp.where(denom > 0, (dmax - data) / denom, jnp.zeros_like(data))
    rgb = map_depth(value)  # u8 at grid resolution, rounded like the reference
    resized = resize_lanczos3(rgb.astype(jnp.float32), out_h, out_w)
    return to_u8(resized)


@dataclass
class DepthMap:
    """Clamped inverse-depth grid + original image size (width, height)."""

    data: jnp.ndarray  # (H, W) f32, clamped to [1/250, 1/0.1]
    original_size: Tuple[int, int]

    @classmethod
    def new(cls, inverse_depth: jnp.ndarray, original_size: Tuple[int, int]) -> "DepthMap":
        return cls(data=_clamp_inverse_depth(inverse_depth), original_size=original_size)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    # -- image outputs -----------------------------------------------------

    def render_depth_map(self) -> np.ndarray:
        from matrix_eyes_tpu import aot

        ow, oh = self.original_size

        def render(data):
            return _render_depth_map.__wrapped__(data, oh, ow)

        return np.asarray(aot.call_cached(
            "render_depthmap", render, (self.data,), salt=f"{oh}x{ow}"))

    def render_stereogram(self, resize_scale: Optional[float], amplitude: float,
                          seed: int = 0) -> np.ndarray:
        ow, oh = self.original_size
        if resize_scale is not None:
            # Rust f32::round (half away from zero) on the scaled size
            ow = int(np.floor(np.float32(ow) * np.float32(resize_scale) + 0.5))
            oh = int(np.floor(np.float32(oh) * np.float32(resize_scale) + 0.5))
        return np.asarray(synthesize_stereogram(self.data, oh, ow, amplitude, seed))

    # -- dispatch (output.rs:100-121) --------------------------------------

    def output_image(
        self,
        destination_path: str,
        source_path: str,
        image_format: ImageOutputFormat = ImageOutputFormat.DEPTH_MAP,
        vertex_mode: VertexMode = VertexMode.COLOR,
        resize_scale: Optional[float] = None,
        amplitude: float = 1.0 / 16.0,
        seed: int = 0,
    ) -> None:
        dest = destination_path.lower()
        if dest.endswith(".ply") or dest.endswith(".obj"):
            self._output_mesh(destination_path, source_path, vertex_mode)
        elif image_format == ImageOutputFormat.DEPTH_MAP:
            self._save_image(self.render_depth_map(), destination_path)
        else:
            # Stereogram pixels are random-noise chains -- essentially
            # incompressible -- so zlib level 6 burns seconds of single-core
            # CPU on a 12 MP image for ~no size gain; level 1 encodes ~3x
            # faster. Depth maps are smooth and keep the default level.
            self._save_image(
                self.render_stereogram(resize_scale, amplitude, seed),
                destination_path, fast_png=True)

    @staticmethod
    def _save_image(rgb: np.ndarray, path: str, fast_png: bool = False) -> None:
        from PIL import Image

        kw = {}
        if fast_png and path.lower().endswith(".png"):
            kw["compress_level"] = 1
        try:
            Image.fromarray(rgb, mode="RGB").save(path, **kw)
        except (OSError, ValueError) as e:
            raise OutputError(f"Image error: {e}") from e

    def _output_mesh(self, destination_path: str, source_path: str,
                     vertex_mode: VertexMode) -> None:
        from matrix_eyes_tpu.output import writers
        from matrix_eyes_tpu.output.mesh import build_mesh

        data = self.to_numpy()
        mesh = build_mesh(data)
        image_rgb = None
        if vertex_mode == VertexMode.COLOR:
            image_rgb = self._load_grid_image(source_path, data.shape)

        try:
            if destination_path.lower().endswith(".ply"):
                writers.write_ply(destination_path, mesh, data, self.original_size,
                                  vertex_mode.value, image_rgb)
            else:
                writers.write_obj(destination_path, mesh, data, self.original_size,
                                  vertex_mode.value, image_rgb,
                                  source_image_path=source_path)
        except OSError as e:
            raise OutputError(f"IO error: {e}") from e

    @staticmethod
    def _load_grid_image(source_path: str, grid_shape: Tuple[int, int]) -> np.ndarray:
        """Source image Lanczos3-resized to the depth grid for vertex colours
        (output.rs:206-215). Resampling runs on device."""
        from PIL import Image

        try:
            with Image.open(source_path) as im:
                rgb = np.asarray(im.convert("RGB"))
        except (OSError, ValueError) as e:
            raise OutputError(f"Image error: {e}") from e
        h, w = grid_shape
        resized = resize_lanczos3(jnp.asarray(rgb, jnp.float32), h, w)
        return np.asarray(to_u8(resized))
