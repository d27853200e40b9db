"""JAX API compatibility shims.

``shard_map`` moved from ``jax.experimental.shard_map`` to the ``jax``
namespace (the experimental path is deprecated as of jax 0.8 and emits
DeprecationWarning); the new API also renamed ``check_rep`` to
``check_vma`` and made every parameter keyword-only. Call sites import the
old-style signature from here so they work on either jax.
"""

from __future__ import annotations

import inspect

try:
    from jax import shard_map as _shard_map_new

    if "check_rep" in inspect.signature(_shard_map_new).parameters:
        shard_map = _shard_map_new  # pragma: no cover - transitional jax
    else:
        def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
            return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - jax < 0.8
    from jax.experimental.shard_map import shard_map

__all__ = ["shard_map"]
