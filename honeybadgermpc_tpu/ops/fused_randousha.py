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

from .fused_open import (KMAX, NBAL, PL, _BAL_ROUNDS, _bal_bias,
                         _bal_fold_init, _band_dot_fold, _bands_np,
                         _folded_band_host, _mismatch, _pack16, _pad_band,
                         _planes_of, _planes_of_packed, _round8)
from .limbs import L, MASK, P, W, int_to_limbs
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


def _kd_groups(t: int):
    """Static row-group plans for the split deal kernels. Coefficient
    rows (global ids): row 0 secret, rows 1..t degree-t high, rows
    t+1..3t degree-2t high. Each kernel generates only the 8-row Threefry
    groups it needs; row 0 regenerates identically in both (counters are
    keyed by global row id). Returns (groups, segs) per degree, where
    segs are (start, len) slices into that kernel's generated-row
    order."""
    k1 = t + 1
    ngr_t = -(-k1 // 8)
    plan_t = (tuple(range(ngr_t)), ((0, k1),))
    g_lo, g_hi = k1 // 8, (k1 + 2 * t - 1) // 8
    groups2 = tuple(sorted(set([0]) | set(range(g_lo, g_hi + 1))))
    pos_k1 = groups2.index(g_lo) * 8 + (k1 - g_lo * 8)
    plan_2t = (groups2, ((0, 1), (pos_k1, 2 * t)))
    return plan_t, plan_2t


def _kd_kernel(key_ref, w_ref, o_ref, *, n, t, sp, kc, n1, init, bias,
               groups, segs, kk, kdw):
    """Draw + deal one party's slot tile at one degree. kdw: lane width
    (multiple of TBW — the deal dots were the pipeline's narrowest, so
    this kernel runs wider slot tiles than the storage tile)."""
    njt = n // JT
    src = pl.program_id(0)
    blk = pl.program_id(1)
    key0 = key_ref[0, 0]
    key1 = key_ref[0, 1]
    shape = (8, kdw)
    c1 = (src.astype(jnp.uint32) * jnp.uint32(sp)
          + blk.astype(jnp.uint32) * jnp.uint32(kdw)
          + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    rowid = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    gen = []
    for g in groups:
        c0b = jnp.uint32(_CTR_TAG) + (jnp.uint32(g * 8) + rowid) \
            * jnp.uint32(8)
        rows24 = []
        for s in range(6):
            w0, w1 = _threefry2x32(key0, key1, c0b + jnp.uint32(s), c1)
            for wrd in (w0, w1):
                rows24.append(wrd & MASK)
                rows24.append(wrd >> W)
        gen.append(_redc384_reg(rows24, shape))
    allr = [jnp.concatenate([gen[i][j] for i in range(len(groups))],
                            axis=0) for j in range(L)]

    def rows(j):
        parts = [allr[j][s:s + ln] for (s, ln) in segs]
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=0)

    p = _pack16(_band_dot_fold(
        w_ref[0], _planes_of(rows, kk, kc), n1, init, bias))
    for ct in range(kdw // TBW):
        lane = slice(ct * TBW, (ct + 1) * TBW)
        for jd in range(njt):
            o_ref[ct, jd, :, 0] = p[:, jd * JT:(jd + 1) * JT, lane]


def _ke_kernel(c_ref, w_ref, *refs, n, n_out, ncheck,
               n1, kcn, init, bias, n_outp, ncheckp, mj, agg):
    """Hyperinvertible extraction for JT dst parties, MJ of them merged
    into the matmul lane axis per dot (narrow per-dst N=128 dots measured
    ~3x slower than one wide dot + one fold).
    c_ref (1, 1, PL, n, JT, TBW): received columns, dealer-major.

    agg=False: refs = (keep_ref, chk_ref); w_ref is the full n-point
    re-encode band — the 2t discarded columns stream to the check tensor
    for per-column verification (KC).
    agg=True: refs = (keep_ref, z_ref); w_ref is the RHO-FOLDED band
    (n_out keep columns + ONE run-random aggregated check column, built
    per run by the device-side fold in _randousha_calls). The matmul only
    computes n_out+1 output rows instead of n — at n=64, t=21 that is a
    64 -> 24 row cut of the pipeline's dominant dot (the r04 trace put
    extraction at 47% of device time), and the 2t-column check tensor
    never exists at all."""
    if agg:
        keep_ref, z_ref = refs
    else:
        keep_ref, chk_ref = refs
    for g in range(JT // mj):
        def rows(w, g=g):
            # (n, mj, TBW) -> (n, mj*TBW): sublane->lane merge
            return c_ref[0, 0, w, :, g * mj:(g + 1) * mj].reshape(
                n, mj * TBW)
        planes = _planes_of_packed(rows, n, kcn)
        packed = _pack16(_band_dot_fold(w_ref[0], planes, n1, init, bias))
        wide = packed.reshape(PL, n1, mj, TBW)
        if agg:
            z_ref[:, g * mj:(g + 1) * mj] = wide[:, n_out]
        for jj in range(mj):
            j = g * mj + jj
            keep_ref[:, j] = wide[:, :n_outp, jj]
            if agg:
                continue
            chk = wide[:, n_out:n, jj]           # the ncheck real columns
            if ncheckp > ncheck:
                # zero columns decode to the zero polynomial with zero
                # errors at both degrees, so the padding stays silent
                chk = jnp.concatenate(
                    [chk, jnp.zeros((PL, ncheckp - ncheck, TBW),
                                    jnp.uint32)], axis=1)
            chk_ref[0, 0, :, j] = chk


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


def _rho_plain(key_data):
    """Derive the check-aggregation vector rho: 64 canonical field elements
    from Threefry counter domain 0x20000 (disjoint from the dealer draws,
    which live at c0 >= _CTR_TAG, and from pallas_field's c0 < 6). Plain
    XLA — the arrays are (1, 64), trace-time tiny. Returns uint32
    [L, 64]. Soundness of the batched check built on it: a nonzero
    deviation in any check column survives the rho-combination only if
    sum_j rho_j*delta_j = 0, probability <= 1/p (Schwartz-Zippel)."""
    shape = (1, 64)
    key0 = key_data[0]
    key1 = key_data[1]
    c1 = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)   # kk per lane
    rows24 = []
    for s in range(6):
        w0, w1 = _threefry2x32(key0, key1,
                               jnp.full(shape, jnp.uint32(0x20000 + s)),
                               c1)
        for wrd in (w0, w1):
            rows24.append(wrd & MASK)
            rows24.append(wrd >> W)
    rho = _redc384_reg(rows24, shape)            # L x (1, 64), < p
    return jnp.stack(rho, 0)[:, 0, :]            # [L, 64]


def _bal_digits_device(w):
    """Balanced base-256 digits of canonical values. w: uint32 [L, ...]
    (< p). Returns int8 [NBAL, ...] — the device twin of _bal_digits
    (p's top byte is 0x73 < 0x80, so the final carry is always 0)."""
    carry = jnp.zeros(w.shape[1:], jnp.uint32)
    digs = []
    for r in range(NBAL):
        j, off = divmod(8 * r, W)
        byte = (w[j] >> off) & jnp.uint32(0xFF)
        u = byte + carry
        ge = (u >= 128).astype(jnp.uint32)
        digs.append((u.astype(jnp.int32)
                     - (ge.astype(jnp.int32) << 8)).astype(jnp.int8))
        carry = ge
    return jnp.stack(digs, 0)


# ---------------------------------------------------------------------------
# Plumbing
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _randousha_calls(n: int, t: int, sp: int, points: tuple,
                     aggregate: bool = True, single: bool = False):
    """sp: padded slot count (multiple of TBW). Returns run(key_data) ->
    (keep_t, keep_2t packed [PL, n, n_outp, sp], ok-stats).

    aggregate=True (default): the H2/H3 verification opens run as ONE
    rho-weighted batched check per degree (see _rho_plain — soundness
    1 - 1/p) instead of per-column opens, and rho is FOLDED INTO THE
    EXTRACTION BAND: the KE matmul computes n_out keep rows plus one
    aggregated-check row (n_out+1 rows) instead of all n — at n=64, t=21
    a 64 -> 24 row cut of the pipeline's dominant dot — and the
    2t-column check tensor (>40% of pipeline HBM traffic) never exists.
    The per-column variant remains for the protocol-faithful path and
    fault localization.

    single=True: RanSha — degree-t sharings ONLY (no 2t dealing, no
    extraction at 2t, no cross-degree equality; the degree-t check still
    validates every dealer's degree). run(key) -> (keep_t, nerr). Used
    for the a/b slots of triple generation, which never need the 2t part
    (reference generate_triples uses the full double sharings only out of
    code reuse, offline_randousha.py:154-191 — the 2t halves of a and b
    are discarded)."""
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

    plan_t, plan_2t = _kd_groups(t)

    def kd_call(kk, kc, plan, kdw):
        groups, segs = plan
        nct = kdw // TBW
        return pl.pallas_call(
            functools.partial(_kd_kernel, n=n, t=t, sp=sp, kc=kc, n1=n1a,
                              init=_bal_fold_init(kk), bias=_bal_bias(kk),
                              groups=groups, segs=segs, kk=kk, kdw=kdw),
            grid=(n, sp // kdw),
            in_specs=[
                pl.BlockSpec((1, 2), lambda s, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NBAL * n1a, kc), lambda s, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nct, njt, PL, 1, JT, TBW),
                                   lambda s, b: (b, 0, 0, s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk, njt, PL, n, JT, TBW),
                                           jnp.uint32),
            interpret=_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * sp * NBAL * n1a * kc,
                bytes_accessed=4 * PL * n * sp * n, transcendentals=0),
        )

    # lane widths: the deal dots are the narrowest in the pipeline; wider
    # slot tiles keep the MXU busy (512 lanes measured fastest for both
    # degrees once the rho-folded extraction freed scoped VMEM).
    kdw_t = 512 if sp % 512 == 0 else TBW
    kdw_2 = 512 if sp % 512 == 0 else TBW
    kd_t = kd_call(k1, kc1, plan_t, kdw_t)
    kd_2 = kd_call(k2, kc2, plan_2t, kdw_2)

    # the rho-folded extraction band: n_out keep columns + 1 aggregated
    # check column (aggregate mode); per-column mode re-encodes at all n
    ncp2 = _round8(n_out + 1)
    n1e = ncp2 if aggregate else n1n

    # dst-merge width: the dot intermediate [NBAL*n1, mj*TBW] i32 is the
    # VMEM hog. Per-column mode (n1 = n): mj = 4 at n = 64 missed the
    # 16 MB scoped-vmem limit by 12 KB, so 2 it is. Folded-agg mode
    # (n1 = n_out+1, 24 rows at n=64): the intermediate shrinks ~2.7x,
    # so mj = 4 fits with room (dots 4 MXU tiles wide).
    mj = (4 if aggregate else 2) if n >= 32 else JT

    def ke_call():
        kern = functools.partial(
            _ke_kernel, n=n, n_out=n_out, ncheck=ncheck, n1=n1e, kcn=kcn,
            init=_bal_fold_init(n), bias=_bal_bias(n), n_outp=n_outp,
            ncheckp=ncheckp, mj=mj, agg=aggregate)
        in_specs = [
            pl.BlockSpec((1, 1, PL, n, JT, TBW),
                         lambda j, b: (b, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n1e, kcn), lambda j, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        keep_spec = pl.BlockSpec((PL, JT, n_outp, TBW),
                                 lambda j, b: (0, j, 0, b),
                                 memory_space=pltpu.VMEM)
        keep_shape = jax.ShapeDtypeStruct((PL, n, n_outp, sp), jnp.uint32)
        if aggregate:
            out_specs = [keep_spec,
                         pl.BlockSpec((PL, JT, TBW),
                                      lambda j, b: (0, j, b),
                                      memory_space=pltpu.VMEM)]
            out_shape = [keep_shape,
                         jax.ShapeDtypeStruct((PL, n, sp), jnp.uint32)]
        else:
            out_specs = [keep_spec,
                         pl.BlockSpec((1, 1, PL, JT, ncheckp, TBW),
                                      lambda j, b: (b, j, 0, 0, 0, 0),
                                      memory_space=pltpu.VMEM)]
            out_shape = [keep_shape,
                         jax.ShapeDtypeStruct(
                             (nblk, njt, PL, JT, ncheckp, TBW),
                             jnp.uint32)]
        return pl.pallas_call(
            kern, grid=(njt, nblk), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            interpret=_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * sp * NBAL * n1e * kcn,
                bytes_accessed=4 * PL * n * sp * (n + n_outp + ncheckp),
                transcendentals=0),
        )

    ke = ke_call()

    folded_band = None
    if aggregate:
        # Host constants for the rho-folded extraction band. Keep columns
        # are protocol constants (the first n_out points of the n-point
        # re-encode); the aggregated column u_kk = sum_c rho_c *
        # points[n_out+c]^kk is run-random and folded in on device below.
        from . import montgomery as mont
        R256 = pow(2, 256, P)
        mat_keep = [[pow(int(points[j]), i, P) for j in range(n_out)]
                    for i in range(n)]
        base_band = _pad_band(
            _folded_band_host(mat_keep, _BAL_ROUNDS, ncp2), kcn)
        echk_mont = np.stack(
            [np.stack([np.asarray(int_to_limbs(
                pow(int(points[n_out + c]), i, P) * R256 % P), np.uint32)
                for c in range(ncheck)], axis=-1)
             for i in range(n)], axis=-1)            # [L, ncheck, n]
        cs2 = np.stack([np.asarray(int_to_limbs(
            pow(2, 8 * s + 16 * _BAL_ROUNDS, P) * R256 % P), np.uint32)
            for s in range(NBAL)], axis=-1)          # [L, NBAL]

        def folded_band(key_data):
            """Device-side band fold: [1, NBAL*ncp2, kcn] int8 = host keep
            band + balanced digits of u*2^(8s+32) scattered into the
            aggregated column (tiny XLA — a 42x64 modular matvec)."""
            rho = _rho_plain(key_data)[:, :ncheck]            # [L, ncheck]
            prod = mont.mont_mul(rho[:, :, None],
                                 jnp.asarray(echk_mont))      # [L, nc, n]
            u, m = prod, ncheck
            while m > 1:
                half = m // 2
                s2 = mont.add_mod(u[:, :half], u[:, half:2 * half])
                if m % 2:
                    s2 = jnp.concatenate([s2, u[:, m - 1:m]], axis=1)
                    m = half + 1
                else:
                    m = half
                u = s2
            u = u[:, 0]                                       # [L, n] < p
            w = mont.mont_mul(u[:, None, :],
                              jnp.asarray(cs2)[:, :, None])   # [L, NBAL, n]
            d = _bal_digits_device(w)                         # [r, s, n]
            dev = jnp.zeros((NBAL, ncp2, NBAL * n), jnp.int8)
            dev = dev.at[:, n_out, :].set(d.reshape(NBAL, NBAL * n))
            dev = dev.reshape(NBAL * ncp2, NBAL * n)
            if kcn > NBAL * n:
                dev = jnp.concatenate(
                    [dev, jnp.zeros((NBAL * ncp2, kcn - NBAL * n),
                                    jnp.int8)], axis=1)
            return jnp.asarray(base_band) + dev[None]

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

    kc_t = kc_call(k1, r1_b, n2a, kc1) if not aggregate else None
    kc_2 = kc_call(k2, r2_b, n2b, kc2) if not aggregate else None

    # host numpy bands (lru-cached across traces — see fused_open)
    e1w = np.ascontiguousarray(e1_b)
    e2w = np.ascontiguousarray(e2_b)
    enw = np.ascontiguousarray(en_b)
    r1w = np.ascontiguousarray(r1_b)
    r2w = np.ascontiguousarray(r2_b)

    def _open_z(z, deg):
        """Open the aggregated check column (a degree-`deg` sharing of sp
        values) with the detect-only direct open; returns (secrets packed
        [PL, B'], nerr [n])."""
        from ..parallel.reconstruct import _sim_reconstruct_packed_jit
        kk = deg + 1
        pad = (-sp) % kk
        zp = jnp.concatenate(
            [z, jnp.zeros((PL, n, pad), jnp.uint32)], axis=-1) \
            if pad else z
        opener = _sim_reconstruct_packed_jit(n, deg, False, True,
                                             fallback=False,
                                             replicate=False)
        sec, nerr = opener(zp)
        if sec.ndim == 3:
            # the three-kernel fallback (direct kernel out of VMEM
            # budget at this k) returns the n-replicated view
            sec = sec[:, 0]
        return sec, nerr

    def run(key_data):
        """key_data uint32[2] -> (keep_t, keep_2t [PL, n, n_outp, sp],
        nerr int32 [] total check failures); single=True drops the 2t
        tensor: (keep_t, nerr)."""
        kd_arg = key_data.reshape(1, 2)
        cols_t = kd_t(kd_arg, e1w)
        if aggregate:
            band = folded_band(key_data)
            keep_t, z_t = ke(cols_t, band)
            vt, et = _open_z(z_t, t)
            if single:
                return keep_t, jnp.sum(et)
            cols_2t = kd_2(kd_arg, e2w)
            keep_2t, z_2t = ke(cols_2t, band)
            v2, e2 = _open_z(z_2t, 2 * t)
            neq = jnp.sum(jnp.any(vt[:, :sp] != v2[:, :sp],
                                  axis=0).astype(jnp.int32))
            nerr = jnp.sum(et) + jnp.sum(e2) + neq
            return keep_t, keep_2t, nerr
        keep_t, chk_t = ke(cols_t, enw)
        vt, et = kc_t(chk_t, r1w)
        if single:
            return keep_t, jnp.sum(et[0, :ncheck])
        cols_2t = kd_2(kd_arg, e2w)
        keep_2t, chk_2t = ke(cols_2t, enw)
        v2, e2 = kc_2(chk_2t, r2w)
        # cross-degree equality on the real check columns (packed words)
        neq = jnp.sum(jnp.any(
            vt[:, :ncheck] != v2[:, :ncheck], axis=0).astype(jnp.int32))
        nerr = (jnp.sum(et[0, :ncheck]) + jnp.sum(e2[0, :ncheck]) + neq)
        return keep_t, keep_2t, nerr

    run.parts = (kd_t, kd_2, ke, kc_t, kc_2, e1w, e2w, enw, r1w, r2w)
    run.meta = (n_out, n_outp, ncheck, ncheckp)
    run.folded_band = folded_band
    return run


def sim_ransha_fused(key_data, n: int, t: int, k: int,
                     padded: bool = False):
    """Single-degree RanSha: k slots -> k*(n-2t) verified random DEGREE-t
    sharings, packed [PL, n, k*(n-2t)], plus ok. Same deal/extract/check
    pipeline as RanDouSha minus everything 2t — used for the a/b slots of
    triple generation, where the 2t halves would be dead weight (~40% of
    the double pipeline's kernel time).

    padded=True (requires k % TBW == 0): skip the column-drop slice and
    return the raw 4D keep tensor [PL, n, n_outp, k] in its native
    kernel layout. Rows >= n_out hold the aggregated-check sharing (row
    n_out) and zero sharings — all VALID degree-t sharings, so downstream
    arithmetic/opens pass through them cleanly, and the 4D-native finish
    kernels (pallas_field.mul_add_packed4 / sub_bcast_packed4) consume it
    with zero reshapes. The slice this avoids was a full read+write of
    the tensor, and each flat-layout reshape another (~0.6 ms each at the
    bench shape)."""
    sp = -(-k // TBW) * TBW
    from .rs import Encoding
    enc = Encoding(n)
    points = tuple(int(x) % P for x in enc.points)
    run = _randousha_calls(n, t, sp, points, single=True)
    keep_t, nerr = run(jnp.asarray(key_data, jnp.uint32))
    n_out, n_outp, _, _ = run.meta
    if padded:
        assert sp == k, (sp, k, "padded layout requires k % TBW == 0")
        return keep_t, nerr == 0             # raw 4D [PL, n, n_outp, k]
    v = keep_t[:, :, :n_out, :k]
    return v.reshape(PL, keep_t.shape[1], n_out * k), nerr == 0


def sim_randousha_fused(key_data, n: int, t: int, k: int,
                        padded: bool = False):
    """k slots per party -> packed double sharings, detect-only.

    Returns (r_t, r_2t packed [PL, n, k*(n-2t)], ok bool scalar). Output
    index c*k + s = output-column c (< n-2t) of slot s — every column is
    an independent uniform double sharing, so the stripe order is a
    labeling convention (documented for pool reproducibility).

    padded=True: as in sim_ransha_fused — raw 4D [PL, n, n_outp, k] with
    the real double sharings in rows [:n_out].
    """
    sp = -(-k // TBW) * TBW
    from .rs import Encoding
    enc = Encoding(n)
    points = tuple(int(x) % P for x in enc.points)
    run = _randousha_calls(n, t, sp, points)
    keep_t, keep_2t, nerr = run(jnp.asarray(key_data, jnp.uint32))
    n_out, n_outp, _, _ = run.meta

    if padded:
        assert sp == k, (sp, k, "padded layout requires k % TBW == 0")
        return keep_t, keep_2t, nerr == 0    # raw 4D [PL, n, n_outp, k]

    def finalize(keep):
        v = keep[:, :, :n_out, :k]           # drop col + slot padding
        return v.reshape(PL, n, n_out * k)

    return finalize(keep_t), finalize(keep_2t), nerr == 0
