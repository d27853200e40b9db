import sys, time, os, numpy as np, jax, jax.numpy as jnp
import matrix_eyes_tpu.models.vit as vitmod
from matrix_eyes_tpu.config import DEPTH_PRO
from matrix_eyes_tpu.models.init import init_params_fast
from matrix_eyes_tpu.ops.flash_attention import attention_flash_qkv
cfg = DEPTH_PRO
rng = np.random.RandomState(int.from_bytes(os.urandom(4),'little'))
params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
p0 = jnp.asarray(rng.uniform(-1,1,(35,384,384,3)).astype(np.float32), jnp.bfloat16); p0.block_until_ready()

import matrix_eyes_tpu.ops.flash_attention as fa
orig = fa.attention_flash_qkv

def bench(label, hpb):
    def patched(qkv, H, scale, n_valid=None, heads_per_block=None, interpret=False):
        return orig(qkv, H, scale, n_valid=n_valid, heads_per_block=hpb, interpret=interpret)
    fa.attention_flash_qkv = patched
    f = jax.jit(lambda x, s: jnp.sum(vitmod.forward_features(cfg, params['encoder']['patch_encoder'], x + s.astype(x.dtype), cfg.highres_block_ids, True)[0], dtype=jnp.float32))
    _ = np.asarray(f(p0, jnp.float32(0.)))
    t0=time.perf_counter()
    outs=[f(p0, jnp.float32(i+1)) for i in range(8)]
    _=[np.asarray(o) for o in outs]
    print(f'{label}: {(time.perf_counter()-t0)/8*1000:.1f} ms', flush=True)

# need vit to import name locally; check how block_forward imports
bench('vit hpb=2 ', 2)
bench('vit hpb=8 ', 8)
bench('vit hpb=16', 16)
