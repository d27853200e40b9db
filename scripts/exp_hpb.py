import time, os, numpy as np, jax, jax.numpy as jnp
from matrix_eyes_tpu.ops.flash_attention import attention_flash_qkv
rng = np.random.RandomState(int.from_bytes(os.urandom(4),'little'))
B, H, N, D = 35, 16, 640, 64
C = H*D
qkv0 = jnp.asarray(rng.uniform(-1,1,(B,N,3*C)).astype(np.float32), jnp.bfloat16); qkv0.block_until_ready()
ref = None
for hpb in (2, 4, 8, 16):
    f = jax.jit(lambda x, s, hpb=hpb: jnp.sum(attention_flash_qkv.__wrapped__(x + s.astype(x.dtype), H, 0.125, 577, hpb), dtype=jnp.float32))
    try:
        _ = np.asarray(f(qkv0, jnp.float32(0.)))
    except Exception as e:
        print(f'hpb={hpb}: FAIL {type(e).__name__}', flush=True); continue
    t0=time.perf_counter()
    outs=[f(qkv0, jnp.float32(i+1)) for i in range(10)]
    vals=[np.asarray(o) for o in outs]
    print(f'hpb={hpb}: {(time.perf_counter()-t0)/10*1000:.2f} ms  v={vals[0]:.1f}', flush=True)
