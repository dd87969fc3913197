"""Fully-fused single-chip n-party RanDouSha: four Pallas kernels,
zero inter-stage transposes.

TPU redesign of the offline preprocessing hot path (reference
offline_randousha.py:34-151; the unfused collective program lives in
runtime/offline.py). The unfused pipeline spends ~75% of its wall time on
HBM data formatting: XLA transposes around the band encodes, the PRNG's
limb stacking, and pack/unpack at every stage boundary (xprof, r03). Here
every stage reads its predecessor's natural tiled layout via BlockSpec
index maps — the all_to_all is an index map, exactly like ops/fused_open
— and the dealer's randomness is generated IN-KERNEL (Threefry + the
redc384 reduction from ops/pallas_field), so coefficients never exist in
HBM at all:

  KD deal:    per (src party, slot block): draw 3t+1 uniform coefficient
              rows in registers (row 0 = the shared secret, rows 1..t the
              degree-t poly, rows t+1..3t the degree-2t high part), encode
              BOTH polynomials at the n party points (two folded-band MXU
              dots), scatter columns to every dst party's receive tensor.
  KE extract: per (dst group, slot block): the n received values per slot
              are polynomial coefficients; re-encode at the n points (the
              hyperinvertible matmul). First n-2t outputs stream straight
              into the FINAL packed share layout [PL, n, n_out, S]; the
              last 2t go to the check tensor.
  KC check:   per (col group, slot block): optimistic k-of-n decode of
              each discarded column across all parties + in-kernel
              re-encode validation (the H2/H3 verification opens);
              interpolated secrets out for the cross-degree equality.
  eq:         tiny XLA compare of the two degrees' opened check secrets.

Fault semantics are detect-only (any validation mismatch or cross-degree
inequality flips ok — the protocol's response is an ABORT vote either
way, offline_randousha.py:133-146); hosts wanting fault LOCALIZATION
rerun the eager runtime/offline.py path.

Output contract: packed share tensors [PL, n, n_out * S] for both
degrees, column-major stripes (share of output-column c at slot s lives
at index c*S + s), bit-compatible with ops/fused_open.pack_limbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_open import (KMAX, NBAL, PL, _bal_bias, _bal_fold_init,
                         _band_dot_fold, _bands_np, _mismatch, _pack16,
                         _planes_of, _planes_of_packed, _round8)
from .limbs import L, MASK, P, W
from .mxu_matmul import _interpret
from .pallas_field import _redc384_reg, _threefry2x32

JT = 8                  # dst parties per KE grid step (sublane multiple)
TBW = 128               # slot (lane) tile
CG = 8                  # check columns per KC grid step

# Threefry counter domain tag: keeps KD's streams disjoint from
# pallas_field.rand_limbs_pallas (c0 < 6) under an accidentally shared key.
_CTR_TAG = 0x10000


def fused_fits(n: int, t: int) -> bool:
    return (n % JT == 0 and n <= KMAX and n - 2 * t >= 1
            and 2 * t + 1 <= KMAX and 3 * t + 1 <= 64)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _kd_kernel(key_ref, wt_ref, w2_ref, ot_ref, o2_ref, *, n, t, sp,
               kc1, kc2, n1, i1, b1, i2, b2):
    """Draw + double-deal one party's slot tile. Coefficient rows:
    row 0 secret, rows 1..t degree-t high, rows t+1..3t degree-2t high."""
    k1, k2 = t + 1, 2 * t + 1
    nrows = 3 * t + 1
    ngr = _round8(nrows) // 8
    njt = n // JT
    src = pl.program_id(0)
    blk = pl.program_id(1)
    key0 = key_ref[0, 0]
    key1 = key_ref[0, 1]
    shape = (8, TBW)
    c1 = (src.astype(jnp.uint32) * jnp.uint32(sp)
          + blk.astype(jnp.uint32) * jnp.uint32(TBW)
          + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    rowid = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    groups = []
    for g in range(ngr):
        c0b = jnp.uint32(_CTR_TAG) + (jnp.uint32(g * 8) + rowid) \
            * jnp.uint32(8)
        rows24 = []
        for s in range(6):
            w0, w1 = _threefry2x32(key0, key1, c0b + jnp.uint32(s), c1)
            for wrd in (w0, w1):
                rows24.append(wrd & MASK)
                rows24.append(wrd >> W)
        groups.append(_redc384_reg(rows24, shape))
    # all generated rows, stacked by coefficient index: L x (8*ngr, TBW)
    allr = [jnp.concatenate([groups[g][j] for g in range(ngr)], axis=0)
            for j in range(L)]

    def rows_t(j):
        return allr[j][:k1]

    def rows_2t(j):
        # shared secret row 0 + the degree-2t high part (rows t+1..3t)
        return jnp.concatenate(
            [allr[j][:1], allr[j][k1:k1 + 2 * t]], axis=0)

    pt = _pack16(_band_dot_fold(
        wt_ref[0], _planes_of(rows_t, k1, kc1), n1, i1, b1))
    p2 = _pack16(_band_dot_fold(
        w2_ref[0], _planes_of(rows_2t, k2, kc2), n1, i2, b2))
    for jd in range(njt):
        ot_ref[0, jd, :, 0] = pt[:, jd * JT:(jd + 1) * JT, :]
        o2_ref[0, jd, :, 0] = p2[:, jd * JT:(jd + 1) * JT, :]


def _ke_kernel(c_ref, w_ref, keep_ref, chk_ref, *, n, n_out, ncheck,
               n1, kcn, init, bias, n_outp, ncheckp):
    """Hyperinvertible extraction for JT dst parties (sequential dots).
    c_ref (1, 1, PL, n, JT, TBW): received columns, dealer-major."""
    for jj in range(JT):
        planes = _planes_of_packed(
            lambda w, jj=jj: c_ref[0, 0, w, :, jj], n, kcn)
        packed = _pack16(_band_dot_fold(w_ref[0], planes, n1, init, bias))
        keep_ref[:, jj] = packed[:, :n_outp]
        chk = packed[:, n_out:n]                 # the ncheck real columns
        if ncheckp > ncheck:
            # zero columns decode to the zero polynomial with zero errors
            # at both degrees, so the padding stays silent downstream
            chk = jnp.concatenate(
                [chk, jnp.zeros((PL, ncheckp - ncheck, TBW), jnp.uint32)],
                axis=1)
        chk_ref[0, 0, :, jj] = chk


def _kc_kernel(c_ref, w_ref, vals_ref, errs_ref, *, n, k, nv, ncp, kc,
               init, bias, cg):
    """Optimistic decode + validation of CG check columns, merged into the
    matmul lane axis. c_ref (1, njt, PL, JT, CG, TBW)."""
    def rows(w):
        # (njt, JT, CG, TBW) -> (n, CG*TBW): party-major rows, the CG
        # column tiles merged into lanes (sublane->lane reshape)
        return c_ref[0, :, w].reshape(n, cg * TBW)

    planes = _planes_of_packed(lambda w: rows(w)[:k], k, kc)
    packed = _pack16(_band_dot_fold(w_ref[0], planes, ncp, init, bias))
    # row layout (r1 band): rows 0..nv-1 re-encode at parties k..n-1,
    # row nv = interpolation at 0 (the opened secret)
    wide = packed[:, nv].reshape(PL, cg, TBW)
    vals_ref[...] = wide
    errs = _mismatch(lambda w: packed[w, :nv],
                     lambda w: rows(w)[k:])          # [CG*TBW]
    errs_ref[...] = errs.reshape(1, cg, TBW)


# ---------------------------------------------------------------------------
# Plumbing
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _randousha_calls(n: int, t: int, sp: int, points: tuple):
    """sp: padded slot count (multiple of TBW). Returns run(key_data) ->
    (keep_t, keep_2t packed [PL, n, n_outp, sp], ok-stats)."""
    assert fused_fits(n, t) and sp % TBW == 0
    k1, k2 = t + 1, 2 * t + 1
    n_out = n - 2 * t
    ncheck = 2 * t
    n_outp = _round8(n_out)
    ncheckp = _round8(ncheck)
    njt = n // JT
    nblk = sp // TBW
    ncg = ncheckp // CG

    (e1_b, n1a), _, _, _, kc1 = _bands_np(points, k1)
    (e2_b, _), (r2_b, n2b), _, _, kc2 = _bands_np(points, k2)
    (en_b, n1n), _, _, _, kcn = _bands_np(points, n)
    _, (r1_b, n2a), _, _, _ = _bands_np(points, k1)

    kd = pl.pallas_call(
        functools.partial(_kd_kernel, n=n, t=t, sp=sp, kc1=kc1, kc2=kc2,
                          n1=n1a, i1=_bal_fold_init(k1), b1=_bal_bias(k1),
                          i2=_bal_fold_init(k2), b2=_bal_bias(k2)),
        grid=(n, nblk),
        in_specs=[
            pl.BlockSpec((1, 2), lambda s, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n1a, kc1), lambda s, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n1a, kc2), lambda s, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, njt, PL, 1, JT, TBW),
                         lambda s, b: (b, 0, 0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, njt, PL, 1, JT, TBW),
                         lambda s, b: (b, 0, 0, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, njt, PL, n, JT, TBW), jnp.uint32),
            jax.ShapeDtypeStruct((nblk, njt, PL, n, JT, TBW), jnp.uint32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * sp * NBAL * n1a * (kc1 + kc2),
            bytes_accessed=4 * PL * n * sp * 2 * n, transcendentals=0),
    )

    def ke_call(nref):
        return pl.pallas_call(
            functools.partial(_ke_kernel, n=n, n_out=n_out, ncheck=ncheck,
                              n1=n1n, kcn=kcn, init=_bal_fold_init(n),
                              bias=_bal_bias(n), n_outp=n_outp,
                              ncheckp=ncheckp),
            grid=(njt, nblk),
            in_specs=[
                pl.BlockSpec((1, 1, PL, n, JT, TBW),
                             lambda j, b: (b, j, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NBAL * n1n, kcn), lambda j, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((PL, JT, n_outp, TBW),
                             lambda j, b: (0, j, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, PL, JT, ncheckp, TBW),
                             lambda j, b: (b, j, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((PL, n, n_outp, sp), jnp.uint32),
                jax.ShapeDtypeStruct((nblk, njt, PL, JT, ncheckp, TBW),
                                     jnp.uint32),
            ],
            interpret=_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * sp * NBAL * n1n * kcn,
                bytes_accessed=4 * PL * n * sp * (n + n_outp + ncheckp),
                transcendentals=0),
        )

    ke = ke_call(None)

    def kc_call(k, band, ncp, kc):
        nv = n - k
        return pl.pallas_call(
            functools.partial(_kc_kernel, n=n, k=k, nv=nv, ncp=ncp, kc=kc,
                              init=_bal_fold_init(k), bias=_bal_bias(k),
                              cg=CG),
            grid=(ncg, nblk),
            in_specs=[
                pl.BlockSpec((1, njt, PL, JT, CG, TBW),
                             lambda c, b: (b, 0, 0, 0, c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NBAL * ncp, kc), lambda c, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((PL, CG, TBW), lambda c, b: (0, c, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CG, TBW), lambda c, b: (0, c, b),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((PL, ncheckp, sp), jnp.uint32),
                jax.ShapeDtypeStruct((1, ncheckp, sp), jnp.int32),
            ],
            interpret=_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=2 * ncheckp * sp * NBAL * ncp * kc,
                bytes_accessed=4 * PL * n * sp * ncheckp,
                transcendentals=0),
        )

    kc_t = kc_call(k1, r1_b, n2a, kc1)
    kc_2 = kc_call(k2, r2_b, n2b, kc2)

    # host numpy bands (lru-cached across traces — see fused_open)
    e1w = np.ascontiguousarray(e1_b)
    e2w = np.ascontiguousarray(e2_b)
    enw = np.ascontiguousarray(en_b)
    r1w = np.ascontiguousarray(r1_b)
    r2w = np.ascontiguousarray(r2_b)

    def run(key_data):
        """key_data uint32[2] -> (keep_t, keep_2t [PL, n, n_outp, sp],
        nerr int32 [] total check failures)."""
        cols_t, cols_2t = kd(key_data.reshape(1, 2), e1w, e2w)
        keep_t, chk_t = ke(cols_t, enw)
        keep_2t, chk_2t = ke(cols_2t, enw)
        vt, et = kc_t(chk_t, r1w)
        v2, e2 = kc_2(chk_2t, r2w)
        # cross-degree equality on the real check columns (packed words)
        neq = jnp.sum(jnp.any(
            vt[:, :ncheck] != v2[:, :ncheck], axis=0).astype(jnp.int32))
        nerr = (jnp.sum(et[0, :ncheck]) + jnp.sum(e2[0, :ncheck]) + neq)
        return keep_t, keep_2t, nerr

    run.parts = (kd, ke, kc_t, kc_2, e1w, e2w, enw, r1w, r2w)
    run.meta = (n_out, n_outp, ncheck, ncheckp)
    return run


def sim_randousha_fused(key_data, n: int, t: int, k: int):
    """k slots per party -> packed double sharings, detect-only.

    Returns (r_t, r_2t packed [PL, n, k*(n-2t)], ok bool scalar). Output
    index c*k + s = output-column c (< n-2t) of slot s — every column is
    an independent uniform double sharing, so the stripe order is a
    labeling convention (documented for pool reproducibility).
    """
    sp = -(-k // TBW) * TBW
    from .rs import Encoding
    enc = Encoding(n)
    points = tuple(int(x) % P for x in enc.points)
    run = _randousha_calls(n, t, sp, points)
    keep_t, keep_2t, nerr = run(jnp.asarray(key_data, jnp.uint32))
    n_out, n_outp, _, _ = run.meta

    def finalize(keep):
        v = keep[:, :, :n_out, :k]           # drop col + slot padding
        return v.reshape(PL, n, n_out * k)

    return finalize(keep_t), finalize(keep_2t), nerr == 0
