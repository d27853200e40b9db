import time, os, numpy as np, jax, jax.numpy as jnp
from matrix_eyes_tpu.ops.stereogram import stereogram_geometry, _synthesize, reference_rows
from matrix_eyes_tpu.ops.resize import depthmap_bilinear_resample
rng = np.random.RandomState(int.from_bytes(os.urandom(4),'little'))
src_h, src_w = 3024, 4032
amplitude = 1/16
dm, pw = stereogram_geometry(src_w, amplitude)
depth0 = jnp.asarray(rng.uniform(0.01,9.9,(1536,1536)).astype(np.float32)); depth0.block_until_ready()

g = np.asarray(rng.uniform(0.004,10,(23,29)).astype(np.float32))
H, W, amp2 = 37, 101, 0.11
dm2, pw2 = stereogram_geometry(W, amp2)
out = np.asarray(_synthesize(jnp.asarray(g), jax.random.PRNGKey(3), H, W, pw2, dm2))
sampled = np.asarray(depthmap_bilinear_resample(jnp.asarray(g), H, W))
dn = (sampled - g.min())/(g.max()-g.min())
noise = np.asarray(jax.random.randint(jax.random.PRNGKey(3), (H, max(pw2,1), 3), 0, 256, dtype=jnp.uint8))
want = reference_rows(dn, noise, pw2, dm2)
print('tpu kernel equal to reference:', np.array_equal(out, want), flush=True)

@jax.jit
def stereo(d, i, key):
    s = _synthesize.__wrapped__(d + i, key, src_h, src_w, pw, dm)
    return jnp.sum(s.astype(jnp.uint32))
_ = np.asarray(stereo(depth0, jnp.float32(0), jax.random.PRNGKey(0)))
print('compiled', flush=True)
t0=time.perf_counter()
outs=[stereo(depth0, jnp.float32(i+1), jax.random.PRNGKey(i)) for i in range(6)]
_=[np.asarray(o) for o in outs]
print('stereogram total per call:', (time.perf_counter()-t0)/6*1000, 'ms', flush=True)
