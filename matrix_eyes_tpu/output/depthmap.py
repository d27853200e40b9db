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

def transfer_band_rows(out_h: int) -> int:
    """Device->host transfer granularity for an image save: ONE buffer
    per plane, always.

    Through a remote-device link, the first fetch of each output buffer
    of a freshly loaded executable pays a per-buffer round-trip setup
    cost (measured 2-8 s PER OUTPUT through the dev tunnel: a one-shot
    CLI write once spent 230+ s fetching 24 row bands whose bytes move in
    under a second as one buffer; the same 24 fetches cost ~0 on the
    executable's SECOND call). Fine-grained device banding would buy
    transfer/encode overlap worth <= ~0.18 s/image at steady state -- and
    cost seconds per output on every one-shot CLI run plus an extra
    remote compile per geometry if made adaptive. So transfers are
    whole-plane; the encode worker pool's parallelism (and the PNG's
    byte-exact stripe boundaries) are preserved by re-slicing the HOST
    copy at output/png.py ENCODE_ROWS. On a local-PCIe production host
    the two designs are equivalent (per-buffer setup ~us, 17 MB moves in
    ~ms); this one is strictly better over remote links.
    """
    return max(out_h, 1)


def stereogram_size(original_size: Tuple[int, int],
                    resize_scale: Optional[float]) -> Tuple[int, int]:
    """(ow, oh) of the stereogram output -- the source size under the
    reference's f32::round (half away from zero) scaling (output.rs:154).
    Module-level so the pipeline can derive the output geometry (for the
    noise prefetch) before the model forward has produced a DepthMap."""
    ow, oh = original_size
    if resize_scale is not None:
        ow = int(np.floor(np.float32(ow) * np.float32(resize_scale) + 0.5))
        oh = int(np.floor(np.float32(oh) * np.float32(resize_scale) + 0.5))
    return ow, oh


def maybe_prefetch_stereo_noise(destination_path: str, image_format,
                                original_size: Tuple[int, int],
                                resize_scale: Optional[float],
                                amplitude: float, seed: int):
    """Best-effort stereogram noise prefetch, called BEFORE the model
    forward so the noise plane's device->host transfer rides the link
    while the device computes depth (ops.stereogram.prefetch_stereogram_
    noise). Returns None whenever the compact save path would not engage;
    a failure can only cost time -- synthesize_stereogram_split
    regenerates on any mismatch."""
    try:
        if ImageOutputFormat(image_format) != ImageOutputFormat.STEREOGRAM:
            return None
        if not destination_path.lower().endswith(".png"):
            return None
        from matrix_eyes_tpu.ops.stereogram import prefetch_stereogram_noise
        from matrix_eyes_tpu.output import png

        if not png.split_supported():
            return None
        ow, oh = stereogram_size(original_size, resize_scale)
        br = transfer_band_rows(oh)
        return prefetch_stereogram_noise(oh, ow, amplitude, seed, br)
    except Exception:
        return None


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


@partial(jax.jit, static_argnames=())
def _render_depth_map_grid(data: jnp.ndarray) -> jnp.ndarray:
    """Normalise (near = bright) and colour via the viridis LUT at GRID
    resolution -- the image the reference builds before its resize_exact
    (output.rs:123-133). u8 (H, W, 3)."""
    dmin = jnp.min(data)
    dmax = jnp.max(data)
    denom = dmax - dmin
    value = jnp.where(denom > 0, (dmax - data) / denom, jnp.zeros_like(data))
    return map_depth(value)  # u8 at grid resolution, rounded like the reference


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _render_depth_map(data: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Normalise (near = bright), colour via the viridis LUT, Lanczos3-resize
    to the original size (output.rs:123-139)."""
    rgb = _render_depth_map_grid.__wrapped__(data)
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

    def render_depth_map_grid(self):
        """Depth-map colour image at GRID resolution (device array, u8
        (H, W, 3)) -- the compact transfer form for the host-resize save
        path (output/png.save_depthmap_host_resize): 3 B/px at grid size
        instead of source size, ~5x less link traffic for a 12 MP photo."""
        from matrix_eyes_tpu import aot

        return aot.call_cached(
            "render_depthmap_grid", _render_depth_map_grid, (self.data,))

    def render_depth_map_host(self) -> np.ndarray:
        """Full-resolution render via the grid image + the native host
        Lanczos3 resizer -- the exact arithmetic of the PNG save path when
        host resize is active. Device-path equivalence: <=1 u8 count on
        <2e-5 of pixels (tests/test_lanczos_native.py)."""
        from matrix_eyes_tpu.native import lanczos

        ow, oh = self.original_size
        return lanczos.resize_rgb8(np.asarray(self.render_depth_map_grid()),
                                   oh, ow)

    def render_depth_map_bands(self):
        """Depth-map render as a tuple of device row bands (one dispatch)
        for transfer/encode overlap (output/png.save_device_bands)."""
        from matrix_eyes_tpu import aot
        from matrix_eyes_tpu.ops.stereogram import band_bounds

        ow, oh = self.original_size
        br = transfer_band_rows(oh)
        bounds = band_bounds(oh, br)

        def render(data):
            img = _render_depth_map.__wrapped__(data, oh, ow)
            return tuple(img[lo:hi] for lo, hi in bounds)

        return aot.call_cached(
            "render_depthmap_bands", render, (self.data,),
            salt=f"{oh}x{ow}|br={br}")

    def _stereogram_size(self, resize_scale: Optional[float]) -> Tuple[int, int]:
        return stereogram_size(self.original_size, resize_scale)

    def render_stereogram(self, resize_scale: Optional[float], amplitude: float,
                          seed: int = 0) -> np.ndarray:
        ow, oh = self._stereogram_size(resize_scale)
        return np.asarray(synthesize_stereogram(self.data, oh, ow, amplitude, seed))

    def render_stereogram_bands(self, resize_scale: Optional[float],
                                amplitude: float, seed: int = 0):
        from matrix_eyes_tpu.ops.stereogram import synthesize_stereogram_bands

        ow, oh = self._stereogram_size(resize_scale)
        br = transfer_band_rows(oh)
        return synthesize_stereogram_bands(self.data, oh, ow, amplitude, seed,
                                           band_rows=br)

    def render_stereogram_split(self, resize_scale: Optional[float],
                                amplitude: float, seed: int = 0,
                                noise=None):
        from matrix_eyes_tpu.ops.stereogram import synthesize_stereogram_split

        ow, oh = self._stereogram_size(resize_scale)
        br = transfer_band_rows(oh)
        return synthesize_stereogram_split(self.data, oh, ow, amplitude, seed,
                                           band_rows=br, noise=noise)

    # -- dispatch (output.rs:100-121) --------------------------------------

    def prepare_output(
        self,
        destination_path: str,
        source_path: str,
        image_format: ImageOutputFormat = ImageOutputFormat.DEPTH_MAP,
        vertex_mode: VertexMode = VertexMode.COLOR,
        resize_scale: Optional[float] = None,
        amplitude: float = 1.0 / 16.0,
        seed: int = 0,
        stereo_noise=None,
    ):
        """Phase 1 of :meth:`output_image`: dispatch this output's DEVICE
        render programs now and return a zero-argument writer performing
        phase 2 (the blocking device->host readback + host encode + file
        write).

        The split exists for the batched pipeline: per-device execution is
        FIFO, so chunk k's render programs must enter the queue BEFORE
        chunk k+1's forward is dispatched or the phase-2 readback stalls
        behind that whole forward (pipeline.extract_depth_batch)."""
        from matrix_eyes_tpu import timings
        from matrix_eyes_tpu.output import png

        dest = destination_path.lower()
        if dest.endswith(".ply") or dest.endswith(".obj"):
            # the clamp program was enqueued by DepthMap.new; the mesh
            # build/serialisation is host work off the readback
            return lambda: self._output_mesh(
                destination_path, source_path, vertex_mode)
        if image_format == ImageOutputFormat.DEPTH_MAP:
            ow, oh = self.original_size
            gh, gw = self.data.shape
            if (dest.endswith(".png") and oh * ow > gh * gw
                    and png.host_resize_supported()):
                # upsizing to the source photo: transfer the grid-resolution
                # colour image (3 B/px at 1536^2) and Lanczos3-upsize on the
                # host -- ~5x less device->host traffic than the full plane
                with timings.span("output: render dispatch"):
                    grid = self.render_depth_map_grid()
                return lambda: png.save_depthmap_host_resize(
                    grid, destination_path, oh, ow)
            if dest.endswith(".png"):
                with timings.span("output: render dispatch"):
                    bands = self.render_depth_map_bands()
                return lambda: png.save_device_bands(
                    bands, destination_path, **png.DEPTH_MAP)
            from matrix_eyes_tpu import aot

            def render(data):
                return _render_depth_map.__wrapped__(data, oh, ow)

            with timings.span("output: render dispatch"):
                arr = aot.call_cached(
                    "render_depthmap", render, (self.data,), salt=f"{oh}x{ow}")
            return lambda: self._save_image(np.asarray(arr), destination_path)
        # Stereogram pixel chains are long exact LZ matches, so zlib
        # level 1 already compresses them ~5x while encoding ~2x faster
        # than level 6 (see output/png.py); PNG row filters would only
        # obscure the matches, so the stereogram profile is filter=None.
        split = None
        if dest.endswith(".png") and png.split_supported():
            # compact (shift, noise) form: ~2.2x less device->host
            # traffic; the native encoder replays the linker scan
            with timings.span("output: render dispatch"):
                split = self.render_stereogram_split(
                    resize_scale, amplitude, seed, noise=stereo_noise)
        if split is not None:
            pw, pairs = split
            return lambda: png.save_stereogram_split(
                pairs, destination_path, pw, level=png.STEREOGRAM["level"])
        if dest.endswith(".png"):
            with timings.span("output: render dispatch"):
                bands = self.render_stereogram_bands(
                    resize_scale, amplitude, seed)
            return lambda: png.save_device_bands(
                bands, destination_path, **png.STEREOGRAM)
        ow2, oh2 = self._stereogram_size(resize_scale)
        with timings.span("output: render dispatch"):
            arr = synthesize_stereogram(self.data, oh2, ow2, amplitude, seed)
        return lambda: self._save_image(np.asarray(arr), destination_path,
                                        fast_png=True)

    def output_image(
        self,
        destination_path: str,
        source_path: str,
        image_format: ImageOutputFormat = ImageOutputFormat.DEPTH_MAP,
        vertex_mode: VertexMode = VertexMode.COLOR,
        resize_scale: Optional[float] = None,
        amplitude: float = 1.0 / 16.0,
        seed: int = 0,
        stereo_noise=None,
    ) -> None:
        self.prepare_output(
            destination_path,
            source_path,
            image_format=image_format,
            vertex_mode=vertex_mode,
            resize_scale=resize_scale,
            amplitude=amplitude,
            seed=seed,
            stereo_noise=stereo_noise,
        )()

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
