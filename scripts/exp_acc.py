import time, os, numpy as np, jax, jax.numpy as jnp
import matrix_eyes_tpu.ops.nn as nnmod
from matrix_eyes_tpu.config import DEPTH_PRO
from matrix_eyes_tpu.models import vit
from matrix_eyes_tpu.models.init import init_params_fast
cfg = DEPTH_PRO
rng = np.random.RandomState(int.from_bytes(os.urandom(4),'little'))
params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
p0 = jnp.asarray(rng.uniform(-1,1,(35,384,384,3)).astype(np.float32), jnp.bfloat16); p0.block_until_ready()

def bench(label, flash):
    f = jax.jit(lambda x, s: vit.forward_features(cfg, params['encoder']['patch_encoder'], x + s.astype(x.dtype), cfg.highres_block_ids, flash)[0])
    _ = np.asarray(f(p0, jnp.float32(0.)))
    t0=time.perf_counter()
    outs=[f(p0, jnp.float32(i+1)) for i in range(6)]
    _=[np.asarray(o[0,0,:4]) for o in outs]
    # force all
    _=[np.asarray(o).sum() for o in outs[-1:]]
    dt = (time.perf_counter()-t0)/6
    print(f'{label}: {dt*1000:.1f} ms', flush=True)

bench('f32-acc flash', True)
nnmod.ACC_T = jnp.bfloat16
bench('bf16-out flash', True)
