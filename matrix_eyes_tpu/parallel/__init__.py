"""Multi-chip execution: device meshes and sharding layouts.

The reference is strictly single-device (SURVEY.md section 2: no DP/TP/PP,
no communication backend); its one latent parallel axis is the 35-patch
pyramid batch (encoder.rs:238-250). Here that axis becomes a first-class
``jax.sharding`` layout over an ICI mesh, plus Megatron-style tensor
parallelism over the ViT blocks for the 'model' mesh axis. XLA inserts the
collectives (all-gather at the patch merge, reduce-scatter/all-reduce inside
TP blocks).
"""

from matrix_eyes_tpu.parallel.sharding import (
    make_mesh,
    patch_sharded,
    shard_batch,
    shard_params,
    shard_patches,
)

__all__ = ["make_mesh", "patch_sharded", "shard_batch", "shard_params", "shard_patches"]
