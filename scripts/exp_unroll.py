import time, os, numpy as np, jax, jax.numpy as jnp
from jax import lax
from matrix_eyes_tpu.config import DEPTH_PRO
import matrix_eyes_tpu.models.vit as vitmod
from matrix_eyes_tpu.models.init import init_params_fast
cfg = DEPTH_PRO
rng = np.random.RandomState(int.from_bytes(os.urandom(4),'little'))
params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
p0 = jnp.asarray(rng.uniform(-1,1,(35,384,384,3)).astype(np.float32), jnp.bfloat16); p0.block_until_ready()

def make_scan(unroll):
    def _scan_blocks(cfg, stacked, x, lo, hi, use_flash, n_valid=None):
        if hi <= lo: return x
        seg = {k: v[lo:hi] for k, v in stacked.items()}
        def body(carry, p):
            return vitmod.block_forward(cfg, p, carry, use_flash, n_valid), None
        out, _ = lax.scan(body, x, seg, unroll=unroll)
        return out
    return _scan_blocks

for unroll in (1, 4, 12):
    vitmod._scan_blocks = make_scan(unroll)
    f = jax.jit(lambda x, s: jnp.sum(vitmod.forward_features(cfg, params['encoder']['patch_encoder'], x + s.astype(x.dtype), cfg.highres_block_ids, True)[0], dtype=jnp.float32))
    t0=time.perf_counter(); _ = np.asarray(f(p0, jnp.float32(0.))); print(f'unroll={unroll} compile {time.perf_counter()-t0:.0f}s', flush=True)
    t0=time.perf_counter()
    outs=[f(p0, jnp.float32(i+1)) for i in range(8)]
    _=[np.asarray(o) for o in outs]
    print(f'vit unroll={unroll}: {(time.perf_counter()-t0)/8*1000:.1f} ms', flush=True)
