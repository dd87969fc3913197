import time, jax, numpy as np
from honeybadgermpc_tpu.runtime.offline import sim_offline_jit
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.parallel.reconstruct import sim_batch_reconstruct
n, t, k = 64, 21, 1024
f = sim_offline_jit("generate_triples", n, t, k)
a, b, ab, ok = f(jax.random.PRNGKey(0))
assert bool(jax.device_get(ok))
def openup(x, cols=64):
    sh = FpArray(x.limbs[..., :cols])
    pad = (-cols) % (t+1)
    if pad: sh = FpArray.concatenate([sh, FpArray.zeros((n, pad))], axis=1)
    v, e = sim_batch_reconstruct(sh, n, t)
    assert int(np.asarray(jax.device_get(e)).sum()) == 0
    return FpArray(v.limbs[..., :cols]).to_ints()[0]
va, vb, vab = openup(a), openup(b), openup(ab)
for x, y, xy in zip(va, vb, vab):
    assert int(x)*int(y) % P == int(xy)
print("oracle OK")
out = f(jax.random.PRNGKey(1)); jax.device_get(out[0].limbs.ravel()[:1])
t0 = time.perf_counter()
for i in range(10): out = f(jax.random.PRNGKey(i))
jax.device_get(out[0].limbs.ravel()[:1])
dt = (time.perf_counter()-t0)/10
print(f"triples: {dt*1e3:.1f} ms -> {out[0].shape[-1]/dt/1e3:.0f}k/s")
