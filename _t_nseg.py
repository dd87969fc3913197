import json, sys, time, jax, jax.numpy as jnp
from honeybadgermpc_tpu.ops.fused_open import pack_limbs
from honeybadgermpc_tpu.parallel.reconstruct import _sim_reconstruct_packed_jit
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

n, t = 64, 21
k = t + 1
C, NSEG = int(sys.argv[1]), int(sys.argv[2])
SEG = k * C
pre = PreProcessedElements(n, t, seed=0)
segs = []
for _ in range(NSEG):
    pre.generate_rands(SEG)
    segs.append(jax.jit(pack_limbs)(pre.get_rands(SEG).limbs))
stacked = jnp.stack(segs, 0)
run = _sim_reconstruct_packed_jit(n, t, False, True, fallback=False, replicate=False)
@jax.jit
def run_all(st):
    return jax.lax.map(run, st)
out, nerr = run_all(stacked)
assert int(jax.device_get(nerr).sum()) == 0
B = NSEG * k * C
iters = 12
jax.device_get(out.ravel()[:1])
t0 = time.perf_counter()
for _ in range(iters):
    out, _ = run_all(stacked)
jax.device_get(out.ravel()[:1])
dt = (time.perf_counter() - t0) / iters
print(f"C={C} NSEG={NSEG}: {B/dt/1e6:.1f}M shares/s ({dt*1e3:.1f} ms)")
