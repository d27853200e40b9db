import time, os, numpy as np, jax, jax.numpy as jnp
from matrix_eyes_tpu.config import DEPTH_PRO
from matrix_eyes_tpu.models import vit
from matrix_eyes_tpu.models.init import init_params_fast
cfg = DEPTH_PRO
rng = np.random.RandomState(int.from_bytes(os.urandom(4),'little'))
params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
p0 = jnp.asarray(rng.uniform(-1,1,(35,384,384,3)).astype(np.float32), jnp.bfloat16); p0.block_until_ready()

# numeric check vs xla path on TPU
x_small = p0
ref = vit.forward_features(cfg, params['encoder']['patch_encoder'], x_small, cfg.highres_block_ids, False)[0]
got = vit.forward_features(cfg, params['encoder']['patch_encoder'], x_small, cfg.highres_block_ids, True)[0]
d = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
print('fused-qkv vs xla max diff:', d.max(), flush=True)

def bench(label, flash):
    f = jax.jit(lambda x, s: jnp.sum(vit.forward_features(cfg, params['encoder']['patch_encoder'], x + s.astype(x.dtype), cfg.highres_block_ids, flash)[0], dtype=jnp.float32))
    _ = np.asarray(f(p0, jnp.float32(0.)))
    t0=time.perf_counter()
    outs=[f(p0, jnp.float32(i+1)) for i in range(8)]
    _=[np.asarray(o) for o in outs]
    print(f'{label}: {(time.perf_counter()-t0)/8*1000:.1f} ms', flush=True)

bench('vit fused-qkv flash', True)
bench('vit xla            ', False)
