"""Prototype: contiguity-tiled fused open (v2).

Layout changes vs ops/fused_open.py:
  shares  [n, nc, PL, k, TB]        (block per (src, ci) contiguous 90KB)
  cols    [nc, njt, PL, n, jt, TB]  (K2 block per (ci, j) contiguous 2MB)
  vals    [PL, n, C]                (full-resident in K3, 1.5MB)
  secrets [nc, njt, PL, jt, k, TB]  (K3 block contiguous 2.9MB)
plus: K2/K3 lane-concat the jt dst decodes into ONE wide dot per step.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honeybadgermpc_tpu.ops import montgomery as mont
from honeybadgermpc_tpu.ops.fused_open import (NBAL, PL, TB, _bal_fold_init,
                                               _balance_bytes, _bands_np,
                                               _fold_reduce_bal, _mismatch,
                                               _pack16, pack_limbs,
                                               unpack_limbs)
from honeybadgermpc_tpu.ops.limbs import L, P
from honeybadgermpc_tpu.ops.rs import Encoding

JT = 8


def _planes3_packed(rows, k):
    """Balanced planes from packed words; rows(w) -> uint32 [k, jt, TB].
    Returns int8 [NBAL*k, jt, TB] (row order s-major, matching the
    folded band column order)."""
    us = [((rows(s // 4) >> (8 * (s % 4))) & jnp.uint32(0xFF)).astype(
        jnp.int32) for s in range(NBAL)]
    return _balance_bytes(us, k, NBAL * k)


def _wide_planes(p3, k, kcols, jt):
    """[NBAL*k, jt, TB] -> [kcols, jt*TB] lane-concat + row pad."""
    planes = jnp.concatenate([p3[:, jj] for jj in range(jt)], axis=-1)
    if kcols > NBAL * k:
        planes = jnp.concatenate(
            [planes, jnp.zeros((kcols - NBAL * k, planes.shape[-1]),
                               jnp.int8)], axis=0)
    return planes


def _dot_fold(w_blk, planes, ncp, init):
    d32 = jax.lax.dot_general(w_blk, planes, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    ds = [d32[r * ncp:(r + 1) * ncp] for r in range(NBAL)]
    return _fold_reduce_bal(ds, (ncp, planes.shape[-1]), init)


def make_v2(n, k, C, points):
    nc = C // TB
    jt = JT
    njt = n // jt
    nv = n - k
    (enc_b, n1), (r1_b, n2), (r2_b, n3), _r, kcols = _bands_np(points, k)
    init = _bal_fold_init(k)
    enc_w = np.ascontiguousarray(enc_b)
    r1_w = np.ascontiguousarray(r1_b)
    r2_w = np.ascontiguousarray(r2_b)

    # ---- K1: encode (src p, tile group cg) -> all n dst points -----------
    # NCT chunk tiles per step: lanes NCT*TB wide, one wide dot per step
    NCT = 3 if nc % 3 == 0 else (2 if nc % 2 == 0 else 1)
    ncg = nc // NCT

    def k1_kernel(a_ref, w_ref, o_ref):
        # a_ref (1,1,PL,k,NCT,TB); o_ref (NCT,njt,PL,1,jt,TB)
        p3 = _planes3_packed(
            lambda w: a_ref[0, 0, w].reshape(k, NCT * TB), k)
        planes = p3
        if kcols > NBAL * k:
            planes = jnp.concatenate(
                [planes, jnp.zeros((kcols - NBAL * k, NCT * TB), jnp.int8)],
                axis=0)
        out = _dot_fold(w_ref[0], planes, n1, init)
        packed = _pack16(out)                              # [PL,n1,NCT*TB]
        for ct in range(NCT):
            sl = slice(ct * TB, (ct + 1) * TB)
            for j in range(njt):
                o_ref[ct, j, :, 0] = packed[:, j * jt:(j + 1) * jt, sl]

    k1 = pl.pallas_call(
        k1_kernel,
        grid=(n, ncg),
        in_specs=[
            pl.BlockSpec((1, 1, PL, k, NCT, TB),
                         lambda p, cg: (p, cg, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n1, kcols), lambda p, cg: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NCT, njt, PL, 1, jt, TB),
                               lambda p, cg: (cg, 0, 0, p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, njt, PL, n, jt, TB), jnp.uint32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * C * kcols * NBAL * n1,
            bytes_accessed=4 * n * C * (PL * k + PL * n), transcendentals=0),
    )

    # ---- K2: R1 decode, jt dsts per step, one wide dot -------------------
    def k2_kernel(a_ref, w_ref, vals_ref, errs_ref):
        # a_ref (1,1,PL,n,jt,TB); vals (PL,jt,TB); errs (jt,TB)
        p3 = _planes3_packed(
            lambda w: a_ref[0, 0, w, :k].reshape(k, jt * TB), k)
        planes = p3                                        # [NBAL*k,jt*TB]
        if kcols > NBAL * k:
            planes = jnp.concatenate(
                [planes, jnp.zeros((kcols - NBAL * k, jt * TB), jnp.int8)],
                axis=0)
        out = _dot_fold(w_ref[0], planes, n2, init)
        packed = _pack16(out)                              # [PL,n2,jt*TB]
        for jj in range(jt):
            sl = slice(jj * TB, (jj + 1) * TB)
            vals_ref[:, jj] = packed[:, nv, sl]
            errs_ref[jj] = _mismatch(
                lambda w, sl=sl: packed[w, :nv, sl],
                lambda w, jj=jj: a_ref[0, 0, w, k:, jj])

    k2 = pl.pallas_call(
        k2_kernel,
        grid=(njt, nc),
        in_specs=[
            pl.BlockSpec((1, 1, PL, n, jt, TB),
                         lambda j, ci: (ci, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n2, kcols), lambda j, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PL, jt, TB), lambda j, ci: (0, j, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jt, TB), lambda j, ci: (j, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PL, n, C), jnp.uint32),
            jax.ShapeDtypeStruct((n, C), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * C * kcols * NBAL * n2,
            bytes_accessed=4 * PL * n * C * n, transcendentals=0),
    )

    # ---- K3: R2 decode, vals full-resident, jt dsts one wide dot ---------
    def k3_kernel(a_ref, w_ref, sec_ref, errs_ref):
        # a_ref (PL, n, C) resident; sec (1,1,PL,jt,k,TB); errs (jt,TB)
        ci = pl.program_id(0)
        lane = pl.ds(ci * TB, TB)
        p3 = _planes3_packed(
            lambda w: a_ref[w, :k, lane][:, None], k)      # [., 1, TB]
        planes1 = _wide_planes(p3, k, kcols, 1)            # [kcols, TB]
        # per-dst decode fidelity: jt identical lane blocks, one wide dot
        planes = jnp.broadcast_to(
            planes1[:, None, :], (kcols, jt, TB)).reshape(kcols, jt * TB)
        out = _dot_fold(w_ref[0], planes, n3, init)
        packed = _pack16(out)                              # [PL,n3,jt*TB]
        for jj in range(jt):
            sl = slice(jj * TB, (jj + 1) * TB)
            sec_ref[0, 0, :, jj] = packed[:, :k, sl]
            errs_ref[jj] = _mismatch(
                lambda w, sl=sl: packed[w, k:k + nv, sl],
                lambda w: a_ref[w, k:, lane])

    k3 = pl.pallas_call(
        k3_kernel,
        grid=(nc, njt),
        in_specs=[
            pl.BlockSpec((PL, n, C), lambda ci, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n3, kcols), lambda ci, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, PL, jt, k, TB),
                         lambda ci, j: (ci, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jt, TB), lambda ci, j: (j, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, njt, PL, jt, k, TB), jnp.uint32),
            jax.ShapeDtypeStruct((n, C), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * C * kcols * NBAL * n3,
            bytes_accessed=4 * PL * n * C * (1 + k), transcendentals=0),
    )

    def tile_in(shares_limbs):
        # [L, n, B] -> [n, ncg, PL, k, NCT, TB]
        packed = pack_limbs(shares_limbs)                  # [PL, n, B]
        v = packed.reshape(PL, n, k, ncg, NCT, TB)
        return v.transpose(1, 3, 0, 2, 4, 5)

    def untile_out(sec):
        # [nc, njt, PL, jt, k, TB] -> packed [PL, n, B]
        v = sec.transpose(2, 1, 3, 4, 0, 5)                # [PL,njt,jt,k,nc,TB]
        return v.reshape(PL, n, k * C)

    def run(shares_limbs):
        sh5 = tile_in(shares_limbs)
        cols = k1(sh5, enc_w)
        vals, errs1 = k2(cols, r1_w)
        sec, errs2 = k3(vals, r2_w)
        nerr = jnp.sum(errs1, axis=-1) + jnp.sum(errs2, axis=-1)
        return untile_out(sec), nerr

    run.parts = (k1, k2, k3, enc_w, r1_w, r2_w, tile_in, untile_out)
    return run


def main():
    import random
    from honeybadgermpc_tpu.ops.fparray import FpArray
    from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

    n, t = 64, 21
    k = t + 1
    C = 768
    SEG = k * C
    enc = Encoding(n)
    points = tuple(int(x) % mont.P for x in enc.points)

    # correctness on small batch first
    rng = random.Random(1)
    Bs = 2 * k
    secrets = [rng.randrange(P) for _ in range(Bs)]
    coeffs = [[s] + [rng.randrange(P) for _ in range(t)] for s in secrets]
    small = enc.encode(FpArray.from_ints(coeffs)).transpose((1, 0))
    Cs = Bs // k
    cpad_s = -(-Cs // TB) * TB
    view = small.limbs.reshape(small.limbs.shape[:-1] + (k, Cs))
    view = jnp.concatenate(
        [view, jnp.zeros(view.shape[:-1] + (cpad_s - Cs,), jnp.uint32)], -1)
    run_s = make_v2(n, k, cpad_s, points)
    packed, nerr = jax.jit(
        lambda x: run_s(x.reshape(x.shape[:2] + (k * cpad_s,))))(view)
    got_l = unpack_limbs(packed).reshape(L, n, k, cpad_s)[..., :Cs]
    got = FpArray(got_l.reshape(L, n, Bs)).to_ints()
    ok = all(list(got[j]) == secrets for j in range(n))
    print("correctness:", "OK" if ok else "FAIL",
          "nerr", int(np.asarray(nerr).sum()))
    assert ok

    # perf at the headline shape
    pre = PreProcessedElements(n, t, seed=0)
    pre.generate_rands(SEG)
    shares = pre.get_rands(SEG)
    run = make_v2(n, k, C, points)
    runj = jax.jit(run)

    def force(x):
        return jax.device_get(jax.tree_util.tree_map(
            lambda a: a.ravel()[:1], x))

    out = runj(shares.limbs)
    assert int(np.asarray(jax.device_get(out[1])).sum()) == 0
    force(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = runj(shares.limbs)
    force(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"v2 full open: {dt*1e3:.3f} ms  rate {SEG/dt:,.0f} shares/s")

    # per-kernel
    k1, k2, k3, enc_w, r1_w, r2_w, tile_in, untile_out = run.parts
    sh5 = jax.jit(tile_in)(shares.limbs)
    k1j = jax.jit(lambda v: k1(v, enc_w))
    cols = k1j(sh5)
    k2j = jax.jit(lambda c: k2(c, r1_w))
    vals, e1 = k2j(cols)
    k3j = jax.jit(lambda v: k3(v, r2_w))

    def timeit(name, fn, arg, iters=10):
        force(fn(arg))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(arg)
        force(o)
        print(f"{name:10s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")

    timeit("tile_in", jax.jit(tile_in), shares.limbs)
    timeit("K1", k1j, sh5)
    timeit("K2", k2j, cols)
    timeit("K3", k3j, vals)
    timeit("untile", jax.jit(untile_out), k3j(vals)[0])


if __name__ == "__main__":
    main()
