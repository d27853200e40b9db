"""matrix-eyes-tpu: TPU-native photo -> depth -> autostereogram / 3D mesh pipeline.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of zlogic/matrix-eyes
(reference: Rust + Burn, /root/reference). The Depth Pro network (two DINOv2-style
ViT-L/16 encoders over a 1536x1536 multi-scale patch pyramid, a DPT-style
multiresolution fusion decoder, a depth head and a FOV/focal-length head) runs as
jitted XLA/Pallas TPU programs; preprocessing and the output stages (viridis depth
map, pixel-linked autostereogram, depth-grid mesh export) are device-resident.

Layer map (mirrors reference SURVEY.md section 1):
  L0 tensor/device backend  -> JAX/XLA runtime + Pallas kernels (ops/)
  L1 model                  -> models/ (vit, encoder, decoder, head, fov, depth_pro)
  L2 orchestration          -> pipeline.py (image load/preproc -> model -> output)
  L3 CLI                    -> cli.py
  L4 output                 -> output/ (depthmap render, stereogram, mesh writers)
Auxiliary: pt/ (checkpoint conversion), parallel/ (device-mesh sharding),
progress.py (listener protocol), errors.py (error hierarchy).
"""

__version__ = "0.1.0"

from matrix_eyes_tpu.errors import (
    MatrixEyesError,
    ReconstructionError,
    ModelError,
    LoaderError,
    OutputError,
)

__all__ = [
    "__version__",
    "MatrixEyesError",
    "ReconstructionError",
    "ModelError",
    "LoaderError",
    "OutputError",
]
