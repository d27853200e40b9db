"""Low-noise TPU timing harness.

Methodology (each refinement fixes a measured artifact of the axon relay):

* the iteration loop runs ON DEVICE (``lax.fori_loop`` inside one jit) --
  per-dispatch tunnel latency is ~0.5 s and would dominate any per-call
  timing;
* every iteration perturbs ONE element of the input in place on the loop
  carry (``x.at[0...].set(i)``) -- XLA updates the donated carry buffer
  in place, so the perturbation costs nanoseconds while still defeating
  loop-invariant hoisting and any relay-level memoization.  (The earlier
  whole-tensor ``x * (1+eps)`` perturbation cost a full HBM pass that
  varied 1.0-1.6 ms between runs, swamping sub-ms kernels.)
* the measurement ends with a host readback of a data-dependent checksum.

Usage as a library: ``from tpu_timeit import timeit; timeit(label, body, x)``
where ``body(x) -> f32 scalar``.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def _measure(body, x, n):
    zero_idx = (0,) * x.ndim

    @jax.jit
    def run_n(x, seed0):
        def it(i, carry):
            acc, xc = carry
            xc = xc.at[zero_idx].set((seed0 + i.astype(jnp.float32)).astype(xc.dtype))
            return acc + body(xc), xc

        acc, _ = jax.lax.fori_loop(0, n, it, (jnp.float32(0.0), x))
        return acc

    _ = np.asarray(run_n(x, jnp.float32(0.0)))  # compile + warm
    best = None
    for rep in range(2):
        t0 = time.perf_counter()
        _ = np.asarray(run_n(x, jnp.float32(1.0 + rep)))
        dt = (time.perf_counter() - t0) / n * 1000
        best = dt if best is None else min(best, dt)
    return best


_warmed = False


def timeit(label, body, x, n=50):
    # The first timed dispatch in a process is consistently inflated
    # (~0.5 ms/iter extra, relay warm-path effects); burn it on a dummy
    # measurement so it cannot skew the first baseline.
    global _warmed
    if not _warmed:
        _warmed = True
        _measure(lambda xc: jnp.sum(xc.reshape(-1)[:128].astype(jnp.float32)), x, n)
    # Baseline: identical loop/carry structure with a trivial body, so any
    # carry-copy or loop overhead subtracts out.
    base = _measure(lambda xc: jnp.sum(xc.reshape(-1)[:128].astype(jnp.float32)), x, n)
    t = _measure(body, x, n) - base
    print(f"{label:52s} {t:8.3f} ms  (harness {base:.3f})", flush=True)
    return t
