"""Headline benchmark: robust batch opening of 2^16 shares (n=64, t=21)
on one TPU chip — the reference's own determinant of online performance
(docs/performance.rst; benchmark/test_benchmark_batch_opening.py), at the
BASELINE.json north-star configuration.

Runs the full n-party protocol (both rounds, optimistic decode with robust
validation) batched on a single chip and reports opened shares/second.
The 2^16-share batch is processed in segments sized to HBM (the whole
64-party simulation is resident on one chip, so working set is ~64x a
single party's).

vs_baseline compares against an NTL single-core estimate for the same
pipeline: ~25M 255-bit modmuls/s (NTL ZZ_p on a modern core), ~60 muls per
opened share across encode + two FNT decodes + validation => ~4.0e5
shares/s. The reference publishes no absolute numbers (BASELINE.md), so
this stands in for "NTL single-core" until a native CPU baseline lands.
"""

import json
import time

NTL_SINGLE_CORE_EST = 4.0e5  # shares/s, see docstring


def main():
    from honeybadgermpc_tpu.ops.fparray import FpArray
    from honeybadgermpc_tpu.parallel.reconstruct import _sim_reconstruct_jit
    from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

    n, t = 64, 21
    k = t + 1
    SEG = 16368                               # multiple of k; fits HBM
    NSEG = 4
    B = SEG * NSEG                            # 65472 ~= 2^16 shares

    import jax
    import jax.numpy as jnp

    pre = PreProcessedElements(n, t, seed=0)
    segs = []
    for _ in range(NSEG):                     # deal segment-wise (HBM)
        pre.generate_rands(SEG)
        segs.append(pre.get_rands(SEG))       # [n, SEG]
    stacked = jnp.stack([s.limbs for s in segs], 0)   # [NSEG, L, n, SEG]

    run = _sim_reconstruct_jit(n, t, False, True)

    @jax.jit
    def run_all(st):
        # sequential map over segments: one dispatch for the whole batch,
        # peak memory of a single segment
        return jax.lax.map(run, st)

    # correctness gate: no decode errors on honest shares
    out, nerr = run_all(stacked)
    out.block_until_ready()
    assert int(nerr.sum()) == 0

    # timed runs
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = run_all(stacked)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    rate = B / dt
    print(json.dumps({
        "metric": "batch_open_shares_per_s_n64_t21",
        "value": round(rate, 1),
        "unit": "shares/s",
        "vs_baseline": round(rate / NTL_SINGLE_CORE_EST, 2),
    }))


if __name__ == "__main__":
    main()
