"""Device-side compute primitives (the TPU-native replacement for Burn's L0).

Everything here is a pure function over jnp arrays, designed around TPU
hardware: NHWC layouts (channels on lanes), matmul formulations for the MXU
(patch-embed and all 2x2-stride-2 transposed convolutions are exact matmuls),
dense resampling matrices for resizes, and Pallas kernels for the attention
hot loop.
"""
