import time, os, numpy as np, jax, jax.numpy as jnp
from matrix_eyes_tpu.config import DEPTH_PRO
from matrix_eyes_tpu.models import depth_pro, encoder, decoder, head, fov
from matrix_eyes_tpu.models.init import init_params_fast
cfg = DEPTH_PRO
rng = np.random.RandomState(int.from_bytes(os.urandom(4),'little'))
params = jax.block_until_ready(init_params_fast(cfg, dtype=jnp.bfloat16))
img0 = jnp.asarray(rng.uniform(-1,1,(1,cfg.img_size,cfg.img_size,3)).astype(np.float32), jnp.bfloat16); img0.block_until_ready()

def bench(label, jf, n=6):
    _ = np.asarray(jf(img0, jnp.float32(0.)))
    t0=time.perf_counter()
    outs=[jf(img0, jnp.float32(i+1)) for i in range(n)]
    _=[np.asarray(o) for o in outs]
    print(f'{label}: {(time.perf_counter()-t0)/n*1000:.1f} ms', flush=True)

S = lambda t: jnp.sum(t, dtype=jnp.float32) if t.dtype != jnp.float32 else jnp.sum(t)

@jax.jit
def f_enc(x, s):
    encs = encoder.forward_encodings(cfg, params['encoder'], x + s.astype(x.dtype), True)
    return sum(S(e) for e in encs)
bench('encoder (pyramid+2 ViTs+ups)', f_enc)

@jax.jit
def f_encdec(x, s):
    encs = encoder.forward_encodings(cfg, params['encoder'], x + s.astype(x.dtype), True)
    feats, low = decoder.forward(params['decoder'], encs)
    return S(feats) + S(low)
bench('encoder+decoder', f_encdec)

@jax.jit
def f_full(x, s):
    return S(depth_pro.forward_with_fnorm.__wrapped__(cfg, params, x + s.astype(x.dtype), jnp.float32(0.7), True))
bench('full fnorm', f_full)

@jax.jit
def f_fov(x, s):
    inv, _ = depth_pro.forward_with_fov.__wrapped__(cfg, params, x + s.astype(x.dtype), True)
    return S(inv)
bench('full fov', f_fov)
