"""Library API: load the model once, process many photos.

The CLI (one process per image, like the reference binary) pays checkpoint
load + compile per invocation; for serving/batch workloads this class
amortises both:

    from matrix_eyes_tpu.api import MatrixEyes

    me = MatrixEyes("./checkpoints/depth_pro.pt")
    depth = me.inverse_depth("photo.jpg")            # (1536, 1536) np.f32
    me.process("photo.jpg", "out.png", image_format="stereogram")
    me.process("photo.jpg", "mesh.obj", vertex_mode="plain")
"""

from __future__ import annotations

from typing import Any, Optional, Union

import numpy as np

import jax.numpy as jnp

from matrix_eyes_tpu.config import (
    ModelConfig,
    RuntimeConfig,
    enable_compilation_cache,
    parse_dtype_policy,
)
from matrix_eyes_tpu.io.image import SourceImage, load_source_image
from matrix_eyes_tpu.models import depth_pro
from matrix_eyes_tpu.output.depthmap import DepthMap, ImageOutputFormat, VertexMode
from matrix_eyes_tpu.pipeline import preprocess_image
from matrix_eyes_tpu.pt.loader import load_checkpoint


class MatrixEyes:
    def __init__(
        self,
        checkpoint_path: str,
        dtype: Union[str, Any, None] = None,
        seed: int = 0,
        flash_attention: Optional[bool] = None,
        convert_checkpoints: bool = False,
        cfg: Optional[ModelConfig] = None,
    ):
        enable_compilation_cache()
        quantize_int8 = mixed_bf16 = False
        if isinstance(dtype, str):
            dtype, quantize_int8, mixed_bf16 = parse_dtype_policy(dtype)
        self.runtime = RuntimeConfig(dtype=dtype, seed=seed,
                                     flash_attention=flash_attention,
                                     quantize_int8=quantize_int8,
                                     mixed_bf16=mixed_bf16)
        from matrix_eyes_tpu.config import configure_matmul_precision

        configure_matmul_precision(self.runtime.resolved_dtype(),
                                   self.runtime.mixed_bf16)
        self.cfg, self.params = load_checkpoint(
            checkpoint_path,
            dtype=self.runtime.resolved_dtype(),
            convert_checkpoints=convert_checkpoints,
            cfg=cfg,
            quantize_int8=quantize_int8,
            mixed_bf16=mixed_bf16,
        )

    # -- depth -------------------------------------------------------------

    def _load(self, image: Union[str, np.ndarray, SourceImage],
              focal_length_35mm: Optional[float]) -> SourceImage:
        if isinstance(image, SourceImage):
            if focal_length_35mm is None:
                return image
            # an explicit focal override wins over whatever the
            # pre-loaded source carries (matches the path-loading branch)
            import dataclasses

            return dataclasses.replace(image,
                                       focal_length_35mm=focal_length_35mm)
        if isinstance(image, str):
            return load_source_image(image, focal_length_35mm)
        rgb = np.asarray(image, dtype=np.uint8)
        return SourceImage(rgb=rgb, original_size=(rgb.shape[1], rgb.shape[0]),
                           focal_length_35mm=focal_length_35mm)

    def _params_for_mesh(self, mesh):
        """Session params, sharded over ``mesh`` (cached per mesh -- the
        shard layout, incl. the TP qkv permutation, is mesh-shape-specific
        and costs a device relayout to build)."""
        if mesh is None:
            return self.params
        from matrix_eyes_tpu.parallel.sharding import shard_params

        cached = getattr(self, "_sharded_params", {})
        params = cached.get(mesh)
        if params is None:
            params = shard_params(self.params, mesh,
                                  num_heads=self.cfg.num_heads)
            cached[mesh] = params
            self._sharded_params = cached
        return params

    def _preprocess_stack(self, srcs: "list") -> jnp.ndarray:
        """Stack per-source device preprocessing into one (B,3,S,S) batch."""
        dt = self.runtime.image_dtype()
        return jnp.concatenate(
            [preprocess_image(jnp.asarray(s.rgb), self.cfg.img_size, dtype=dt)
             for s in srcs])

    def _batch_forward(self, params, img, f_norms):
        """ONE forward over an image stack: the fnorm program when every
        focal is known, else the mixed-fnorm program (FOV head fills the
        gaps, known focals override its estimate). Returns (B,S,S)
        device-resident inverse depth."""
        use_flash = self.runtime.use_flash_attention()
        if all(f is not None for f in f_norms):
            return depth_pro.forward_with_fnorm(
                self.cfg, params, img,
                jnp.asarray(f_norms, jnp.float32), use_flash)
        f_arr = jnp.asarray([f if f is not None else 1.0
                             for f in f_norms], jnp.float32)
        has_f = jnp.asarray([f is not None for f in f_norms])
        inv, _ = depth_pro.forward_with_mixed_fnorm(
            self.cfg, params, img, f_arr, has_f, use_flash)
        return inv

    def depth_map(self, image: Union[str, np.ndarray, SourceImage],
                  focal_length_35mm: Optional[float] = None) -> DepthMap:
        """Run the network; returns the device-resident DepthMap."""
        src = self._load(image, focal_length_35mm)
        img = preprocess_image(jnp.asarray(src.rgb), self.cfg.img_size,
                               dtype=self.runtime.image_dtype())
        use_flash = self.runtime.use_flash_attention()
        f_norm = src.f_norm()
        if f_norm is not None:
            inv = depth_pro.forward_with_fnorm(
                self.cfg, self.params, img, jnp.float32(f_norm), use_flash)[0]
        else:
            inv = depth_pro.forward_with_fov(self.cfg, self.params, img, use_flash)[0][0]
        return DepthMap.new(inv, src.original_size)

    def inverse_depth(self, image: Union[str, np.ndarray],
                      focal_length_35mm: Optional[float] = None) -> np.ndarray:
        """Clamped inverse depth (model grid resolution) as numpy f32."""
        return self.depth_map(image, focal_length_35mm).to_numpy()

    def inverse_depth_batch(
        self,
        images: "list",
        focal_length_35mm: Union[float, "list", None] = None,
        mesh=None,
    ) -> np.ndarray:
        """Batched throughput: run ONE forward over a stack of images.

        The batch rides the encoder's pyramid patch axis (35 patches per
        image, `parallel.sharding`), so per-image cost drops well below the
        single-image latency on one chip and scales across a device mesh.

        images: list of paths or (H, W, 3) u8 arrays (sizes may differ;
            each is Lanczos3-resized on device like the single path).
        focal_length_35mm: None (per-image EXIF; the FOV head fills
            gaps), one float for every image, or a per-image sequence with
            None entries for unknown.
        mesh: an optional `parallel.make_mesh(...)` mesh; the batch is
            sharded over its data axis and the ViT blocks over its model
            axis (sharded parameters are cached per mesh on this session).
        Returns (B, S, S) clamped inverse depth, numpy f32.
        """
        if not images:
            return np.zeros((0, self.cfg.img_size, self.cfg.img_size),
                            np.float32)
        if focal_length_35mm is None or isinstance(focal_length_35mm,
                                                   (int, float)):
            focals = [focal_length_35mm] * len(images)
        else:
            focals = list(focal_length_35mm)
            if len(focals) != len(images):
                raise ValueError(
                    f"{len(images)} images but {len(focals)} focal lengths")
        srcs = [self._load(im, f) for im, f in zip(images, focals)]
        img = self._preprocess_stack(srcs)
        f_norms = [s.f_norm() for s in srcs]

        import contextlib

        params = self._params_for_mesh(mesh)
        ctx = contextlib.nullcontext()
        if mesh is not None:
            from matrix_eyes_tpu.parallel.sharding import (
                patch_sharded,
                shard_batch,
            )

            img = shard_batch(img, mesh)
            ctx = patch_sharded(mesh)
        with ctx:
            inv = self._batch_forward(params, img, f_norms)
        return np.asarray(inv, np.float32)

    def depth_maps(self, sources: "list",
                   pad_to_pow2: bool = False) -> "list":
        """ONE batched forward over pre-loaded SourceImages -> per-image
        device-resident DepthMaps. The serving micro-batch building block
        (serve.py coalesces concurrent requests through this).

        ``pad_to_pow2`` pads the batch to the next power of two by
        repeating the last image, bounding the number of distinct compiled
        batch shapes to log2(max batch) + 1 (padded outputs are discarded).
        """
        if not sources:
            return []
        n = len(sources)
        pad = (1 << (n - 1).bit_length()) - n if pad_to_pow2 else 0
        img = self._preprocess_stack(sources)
        if pad:
            # repeat the PREPROCESSED last image; re-running its Lanczos
            # resize per pad slot would waste device time
            img = jnp.concatenate([img] + [img[-1:]] * pad)
        f_norms = [s.f_norm() for s in sources]
        f_norms = f_norms + [f_norms[-1]] * pad
        inv = self._batch_forward(self.params, img, f_norms)
        return [DepthMap.new(inv[i], s.original_size)
                for i, s in enumerate(sources)]

    # -- full pipeline -----------------------------------------------------

    def process(
        self,
        source_path: str,
        destination_path: str,
        focal_length_35mm: Optional[float] = None,
        image_format: str = "depthmap",
        vertex_mode: str = "vertex-colors",
        resize_scale: Optional[float] = None,
        stereo_amplitude: float = 1.0 / 16.0,
    ) -> None:
        """Photo -> output file, same dispatch as the CLI (output.rs:100-121)."""
        from matrix_eyes_tpu.output.depthmap import maybe_prefetch_stereo_noise

        src = self._load(source_path, focal_length_35mm)
        # noise prefetch before the forward: its transfer overlaps the
        # device compute (see pipeline.extract_depth / ops.stereogram)
        stereo_noise = maybe_prefetch_stereo_noise(
            destination_path, ImageOutputFormat(image_format),
            src.original_size, resize_scale, stereo_amplitude,
            self.runtime.seed)
        dm = self.depth_map(src, focal_length_35mm)
        dm.output_image(
            destination_path,
            source_path,
            image_format=ImageOutputFormat(image_format),
            vertex_mode=VertexMode(vertex_mode),
            resize_scale=resize_scale,
            amplitude=stereo_amplitude,
            seed=self.runtime.seed,
            stereo_noise=stereo_noise,
        )

    def process_batch(
        self,
        jobs: "list",
        batch_size: int = 4,
        focal_length_35mm: Optional[float] = None,
        image_format: str = "depthmap",
        vertex_mode: str = "vertex-colors",
        resize_scale: Optional[float] = None,
        stereo_amplitude: float = 1.0 / 16.0,
        mesh=None,
    ) -> None:
        """Photos -> output files with ONE forward per ``batch_size`` images
        (the CLI's ``--batch-size`` through the library; BASELINE config 5).

        ``jobs``: list of ``(source_path, destination_path)``. Per-image
        EXIF focal lengths and output geometry are honoured exactly like
        :meth:`process`; images lacking a focal length engage the FOV head
        for the whole batch (forward_with_mixed_fnorm). ``mesh`` shards the
        image batch over its data axis (``parallel.make_mesh``).

        Failures are isolated per image (the reference's
        one-process-per-image contract, main.rs:161-172): a bad
        decode/render/write skips that image with the canonical stage
        message on stderr, the rest of the jobs complete, and ONE summary
        ReconstructionError ("N of M images failed") is raised at the end.
        Systemic model/preprocess failures still raise immediately.
        """
        from matrix_eyes_tpu.pipeline import extract_depth_batch

        params = self._params_for_mesh(mesh)
        extract_depth_batch(
            self.cfg,
            params,
            jobs,
            batch_size,
            focal_length_35mm=focal_length_35mm,
            image_format=ImageOutputFormat(image_format),
            vertex_mode=VertexMode(vertex_mode),
            resize_scale=resize_scale,
            stereo_amplitude=stereo_amplitude,
            runtime=self.runtime,
            mesh=mesh,
        )
