"""Random parameter initialisation (for tests and benchmarks).

The reference has no training path, so initialisation only needs to produce
well-conditioned activations for shape/parity/benchmark runs; scale is a
truncated-normal-ish fan-in scheme. Real weights come from
``pt.convert.load_params``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from matrix_eyes_tpu.config import ModelConfig
from matrix_eyes_tpu.models.spec import param_spec


def init_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.float32,
                include_fov: bool = True) -> Dict[str, Any]:
    spec = param_spec(cfg, include_fov=include_fov)
    leaves, treedef = jax.tree.flatten(spec)

    def init_leaf(key, s):
        shape = s.shape
        if len(shape) >= 2:
            fan_in = 1
            for d in shape[:-1]:
                fan_in *= d
            w = jax.random.normal(key, shape, jnp.float32) * (1.0 / max(fan_in, 1)) ** 0.5
        else:
            # biases / norm params: small nonzero values so LayerScale and
            # norms do not zero the network out (the real checkpoint's
            # gammas are nonzero).
            w = jax.random.uniform(key, shape, jnp.float32, 0.05, 0.3)
        return w.astype(dtype)

    # One jitted program for the whole tree: through a remote device relay
    # each eager RNG op is a ~0.5 s dispatch round-trip, so per-leaf init
    # of the ~900-leaf production model measured ~10 minutes; a single
    # dispatch runs in seconds.
    @jax.jit
    def init_all(seed_arr):
        keys = jax.random.split(jax.random.PRNGKey(seed_arr), len(leaves))
        return [init_leaf(k, s) for k, s in zip(keys, leaves)]

    return jax.tree.unflatten(treedef, init_all(jnp.uint32(seed)))


def init_params_fast(cfg: ModelConfig, dtype=jnp.float32, include_fov: bool = True):
    """Constant-filled parameters, for benchmarks where only shapes/dtypes
    matter (dense-op timing is data-independent). Dispatches one fill per
    leaf instead of per-leaf RNG -- seconds instead of minutes at ViT-L x3
    scale."""
    spec = param_spec(cfg, include_fov=include_fov)
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.01, dtype=dtype), spec)
