"""GF(p) matrix multiply on the MXU (systolic array).

The VPU/Pallas matmul (ops/pallas_field.py) costs a full CIOS multiply per
(B, k, n) term. This path moves the multiply-accumulate onto the MXU:

 1. Operands decompose into 7-bit planes (37 planes cover 259 bits; values
    0..127 fit int8 exactly).
 2. The base-2^7 product convolution is ONE int8 matmul against a
    block-band matrix built from V's planes — output planes are the
    convolution diagonals, each < k*37*127^2 < 2^31 (int32-safe).
 3. An epilogue folds the 73 base-2^7 diagonals into carry-save 16-bit
    limbs and runs 17 Montgomery REDC rounds (dividing by 2^272). The
    extra 2^-16 is cancelled by pre-scaling V by 2^16, so the output is
    the standard Montgomery form of sum_k a*v. 17 rounds keep the
    pre-reduction value (< k*p^2 < p*2^272 for any k < 2^17) inside the
    single-cond-sub bound.

Two implementations:

* ``fp_matmul_mxu_fused`` — ONE Pallas kernel: the A-operand plane
  decomposition, the int8 MXU dot, and the REDC epilogue all happen in
  VMEM; HBM traffic is exactly inputs + outputs (the int32 diagonal
  tensor — B*n*73*4 bytes, ~9x the output — never leaves the chip). The
  band constant's rows are ordered (diagonal, point) so each diagonal is
  a sublane-contiguous [TN, TB] slice for the epilogue.
* ``fp_matmul_mxu`` — XLA dot_general + standalone Pallas epilogue;
  fallback for shapes whose band tile exceeds VMEM.

Bit-exact against the scan/Pallas paths (tests/test_pallas_field.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import L, MASK, N0, P, P_LIMBS, R_MOD_P, W, int_to_limbs

PLANE_BITS = 7
NPLANES = 37                  # ceil(259 / 7) covers 256-bit values
NOUT = 2 * NPLANES - 1        # 73 product diagonals
REDC_ROUNDS = 17              # divide by 2^272; see module docstring
_P = [int(x) for x in P_LIMBS]

# 2^16 * R mod p as Montgomery multiplier constant (mont_mul(x, this) =
# x * 2^16): cancels the 2^-16 surplus of the 17-round REDC.
_SCALE_PRE = int_to_limbs((1 << (16 * REDC_ROUNDS - 256)) * R_MOD_P % P)


def _planes7(limbs):
    """uint32[L, ...] 16-bit limbs -> int8[..., NPLANES] base-2^7 digits.
    Digit d covers bits [7d, 7d+7), assembled from 1-2 limbs."""
    outs = []
    for d in range(NPLANES):
        lo_bit = PLANE_BITS * d
        j, r = divmod(lo_bit, W)
        v = limbs[j] >> r
        if r + PLANE_BITS > W and j + 1 < L:
            v = v | (limbs[j + 1] << (W - r))
        outs.append((v & 0x7F).astype(jnp.int8))
    return jnp.stack(outs, axis=-1)


def _scaled_planes(v_limbs):
    """v[L, k, n] Montgomery limbs -> int8[k, n, NPLANES] planes of
    v * 2^(16*REDC_ROUNDS-256) (the REDC pre-scale baked in)."""
    from . import montgomery as mont
    k, n = v_limbs.shape[1], v_limbs.shape[2]
    scale = mont.const_stack(_SCALE_PRE, (k, n))
    w = mont.mont_mul(v_limbs, scale)
    return _planes7(w)                             # [k, n, NPLANES]


def _build_vband(v_limbs):
    """v[L, k, n] -> V' int8[k*NPLANES, n*NOUT] (column (nn, l) holds
    plane l-i of v[:, nn] at row (kk, i)). For the unfused path."""
    k, n = v_limbs.shape[1], v_limbs.shape[2]
    v8 = _scaled_planes(v_limbs)                   # [k, n, NPLANES]
    band = jnp.zeros((k, NPLANES, n, NOUT), jnp.int8)
    for i in range(NPLANES):
        band = jax.lax.dynamic_update_slice(
            band, v8[:, None, :, :], (0, i, 0, i))
    return band.reshape(k * NPLANES, n * NOUT)


def _redc_diagonals(ds, shape):
    """73 int32 diagonal arrays (each < 2^31) -> L canonical Montgomery
    uint32 limb arrays. Shared epilogue of both MXU paths."""
    NL = 36  # carry-save limbs: 73 planes * 7 bits = 511 bits -> 32 limbs,
             # +2 slack for carry-save spill, +2 for m*p adds

    t = [jnp.zeros(shape, jnp.uint32) for _ in range(NL)]
    # pair adjacent diagonals first: e = d_2i + d_2i+1 * 2^7 stays < 2^32
    # (each d < 2^24 when k*37*127^2 < 2^24... callers guarantee < 2^31 so
    # use the pair only when the shifted add cannot overflow) — the pair
    # shares one (j, r) decomposition, halving the fold work.
    pairs = []
    for i in range(0, NOUT - 1, 2):
        pairs.append((PLANE_BITS * i,
                      ds[i].astype(jnp.uint32) +
                      (ds[i + 1].astype(jnp.uint32) << PLANE_BITS)))
    if NOUT % 2:
        pairs.append((PLANE_BITS * (NOUT - 1),
                      ds[NOUT - 1].astype(jnp.uint32)))
    for bit, d in pairs:
        j, r = divmod(bit, W)
        # d * 2^r spans 3 limb chunks; compute each in-range (a bare
        # d << r would overflow uint32 for r > 1)
        dlo, dhi = d & MASK, d >> W
        c0 = (dlo << r) & MASK
        c1 = (((dlo >> (W - r)) if r else jnp.zeros_like(d)) |
              ((dhi << r) & MASK)) & MASK
        c2 = (dhi >> (W - r)) if r else jnp.zeros_like(d)
        t[j] = t[j] + c0
        if j + 1 < NL:
            t[j + 1] = t[j + 1] + c1
        if j + 2 < NL:
            t[j + 2] = t[j + 2] + c2
    # carry-save limbs are < 2^28 (paired contributions < 2^25 each, a few
    # per limb); REDC rounds below add m*P pieces < 2^17 — still < 2^31,
    # and each round's left shift consumes the accumulated carries.

    one = jnp.uint32(1)
    for _ in range(REDC_ROUNDS):
        m = ((t[0] & MASK) * jnp.uint32(N0)) & MASK
        for j in range(L):
            pj = _P[j]
            if pj == 0:
                continue
            if pj == 1:                      # limb 0 of the modulus
                t[j] = t[j] + m
            elif pj == 0xFFFF:               # m*0xFFFF = (m<<16) - m
                t[j] = t[j] + ((-m) & MASK)
                t[j + 1] = t[j + 1] + m - (m != 0).astype(jnp.uint32)
            else:
                pr = m * jnp.uint32(pj)
                t[j] = t[j] + (pr & MASK)
                t[j + 1] = t[j + 1] + (pr >> W)
        carry0 = t[0] >> W
        t = t[1:] + [jnp.zeros(shape, jnp.uint32)]
        t[0] = t[0] + carry0

    # normalize to canonical limbs; value < 2p so carries die out by L+1
    c = jnp.zeros(shape, jnp.uint32)
    out = []
    for j in range(L):
        v = t[j] + c
        out.append(v & MASK)
        c = v >> W
    # conditional subtract p (single bit of overflow possible in c)
    hi = c
    borrow = jnp.zeros(shape, jnp.uint32)
    d2 = []
    for j in range(L):
        v = out[j] - jnp.uint32(_P[j]) - borrow
        d2.append(v & MASK)
        borrow = (v >> W) & jnp.uint32(1)
    take = (hi != 0) | (borrow == 0)
    return [jnp.where(take, d2[j], out[j]) for j in range(L)]


def _redc_kernel(d_ref, o_ref):
    """d_ref [NOUT, SUBS, LANES] int32 diagonals -> o_ref [L, SUBS, LANES]
    canonical Montgomery limbs."""
    shape = d_ref.shape[1:]
    out = _redc_diagonals([d_ref[l] for l in range(NOUT)], shape)
    o_ref[...] = jnp.stack(out, axis=0)


def _interpret():
    return jax.default_backend() in ("cpu",)


# ---------------------------------------------------------------------------
# Fused kernel: planes + int8 dot + REDC in one VMEM-resident pass
# ---------------------------------------------------------------------------

def _fused_kernel(a_ref, w_ref, o_ref, *, k, tn, kcols):
    """a_ref [L+1, k, TB] uint32 (row L is zeros — the plane builder's
    out-of-range high-limb source); w_ref [NOUT*tn, kcols] int8 band
    constant; o_ref [L, tn, TB] canonical Montgomery limbs."""
    TB = a_ref.shape[2]

    # A planes: [kcols, TB] int8, row (d*k + kk) = digit d of a[:, kk].
    # Digit-major row order makes every digit a limb-row pair of the input
    # block with a scalar shift — no gather, no vector shift, no reshape.
    # The band constant's columns use the same (d, kk) order.
    blocks = []
    for d in range(NPLANES):
        j, r = divmod(PLANE_BITS * d, W)
        v = a_ref[j] >> r                          # [k, TB]
        if r > W - PLANE_BITS:                     # digit straddles limbs
            v = v | (a_ref[j + 1] << (W - r))
        blocks.append((v & jnp.uint32(0x7F)).astype(jnp.int8))
    if kcols > k * NPLANES:
        blocks.append(jnp.zeros((kcols - k * NPLANES, TB), jnp.int8))
    planes = jnp.concatenate(blocks, axis=0)       # [kcols, TB]

    # MXU: [NOUT*tn, kcols] @ [kcols, TB] -> [NOUT*tn, TB] int32
    d32 = jax.lax.dot_general(
        w_ref[0], planes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    # REDC over sublane-contiguous diagonal slices [tn, TB]
    ds = [d32[l * tn:(l + 1) * tn, :] for l in range(NOUT)]
    out = _redc_diagonals(ds, (tn, TB))
    o_ref[...] = jnp.stack(out, axis=0)


@functools.lru_cache(maxsize=None)
def _fused_call(k: int, n: int, bpadded: int):
    TB = 128
    TN = min(n, 128)
    npad = -n % TN
    ntiles = (n + npad) // TN
    kcols = -(-(k * NPLANES) // 32) * 32
    nb = bpadded // TB
    kern = functools.partial(_fused_kernel, k=k, tn=TN, kcols=kcols)
    return pl.pallas_call(
        kern,
        grid=(nb, ntiles),
        in_specs=[
            pl.BlockSpec((L + 1, k, TB), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NOUT * TN, kcols), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, TN, TB), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n + npad, bpadded), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bpadded * kcols * NOUT * (n + npad),
            bytes_accessed=4 * L * (bpadded * (k + n)) + kcols * NOUT * n,
            transcendentals=0),
    ), TN, npad


def fused_fits(k: int, n: int) -> bool:
    """Band tile + int32 dot output must fit VMEM alongside the epilogue
    state (~2 MB): NOUT*TN rows of kcols int8 plus [NOUT*TN, 128] int32.
    n < 4 is excluded: Mosaic aborts compiling the 1- and 2-sublane
    diagonal slices (lower_to_llo Check d>>32==0), and tiny outputs gain
    nothing from the MXU anyway."""
    if n < 4:
        return False
    TN = min(n, 128)
    kcols = -(-(k * NPLANES) // 32) * 32
    band = NOUT * TN * kcols
    d32 = NOUT * TN * 128 * 4
    return band + d32 < 9 * 2 ** 20


def fp_matmul_mxu_fused(a_limbs, v_limbs):
    """a[L, B, k] @ v[L, k, n] (both Montgomery) -> [L, B, n]. Fully fused
    Pallas kernel; see module docstring."""
    Lx, B, k = a_limbs.shape
    n = v_limbs.shape[2]
    # band constant, rows grouped (l, nn) per TN-tile
    v8 = _scaled_planes(v_limbs)                   # [k, n, NPLANES]
    call, TN, npad = _fused_call(k, n, B + (-B % 128))
    kcols = -(-(k * NPLANES) // 32) * 32
    if npad:
        v8 = jnp.concatenate(
            [v8, jnp.zeros((k, npad, NPLANES), jnp.int8)], axis=1)
    ntiles = (n + npad) // TN
    band = jnp.zeros((k, NPLANES, n + npad, NOUT), jnp.int8)
    for i in range(NPLANES):
        band = jax.lax.dynamic_update_slice(
            band, v8[:, None, :, :], (0, i, 0, i))
    # [k, NPLANES, ntiles, TN, NOUT] -> [ntiles, NOUT, TN, NPLANES, k]
    # (digit-major columns, matching the kernel's plane row order)
    w = band.reshape(k, NPLANES, ntiles, TN, NOUT)
    w = w.transpose(2, 4, 3, 1, 0).reshape(ntiles, NOUT * TN, k * NPLANES)
    if kcols > k * NPLANES:
        w = jnp.concatenate(
            [w, jnp.zeros((ntiles, NOUT * TN, kcols - k * NPLANES),
                          jnp.int8)], axis=2)

    bpad = -B % 128
    at = jnp.swapaxes(a_limbs, 1, 2)               # [L, k, B]
    at = jnp.concatenate(
        [at, jnp.zeros((1, k, B), jnp.uint32)], 0)  # zero high-limb row
    if bpad:
        at = jnp.concatenate(
            [at, jnp.zeros((L + 1, k, bpad), jnp.uint32)], 2)
    out = call(at, w)                              # [L, n+npad, B+bpad]
    return jnp.swapaxes(out[:, :n, :B], 1, 2)


# ---------------------------------------------------------------------------
# Folded-constant path (v2): mod-p-reduced band, 37 diagonals, 1-2 REDC rounds
# ---------------------------------------------------------------------------
#
# v1 computes the full 511-bit product convolution (73 diagonals) and pays a
# 17-round REDC epilogue. v2 folds the reduction into the CONSTANT operand:
# for each 7-bit digit position d of the data, precompute
#
#     w_dk = v_k * 2^(7d) * 2^(16*ROUNDS) * R^{-1}  (mod p)        (< p)
#
# and decompose w_dk itself into 37 base-2^7 digits. The int8 matmul
#
#     diag_s = sum_{k,d} digit_d(a_k) * digit_s(w_dk)
#
# then represents  V = sum_s diag_s 2^(7s) = sum_{k,d} digit_d(a_k) * w_dk
# which is ALREADY ≡ (sum_k a_k v_k) * R^{-1} * 2^(16*ROUNDS)  (mod p) and
# bounded by 37*127*k*p. The epilogue shrinks to: fold 37 diagonals (7-bit
# spacing) + ROUNDS Montgomery 16-bit REDC steps + two conditional
# subtractions. ROUNDS = 1 while 37*127*k <= 2^17 (k <= 27), else 2.
# Output columns drop from 73 to 37 per point: the MXU does ~half the work
# of v1 and the VPU ~a quarter.
#
# int32 accumulator bound: 37*k*127^2 < 2^31  =>  k <= 3540.

K_ROUNDS1 = (1 << 17) // (NPLANES * 127)      # = 27


def _rounds_for(k: int) -> int:
    return 1 if k <= K_ROUNDS1 else 2


def _redc_step(t, shape):
    """One 16-bit Montgomery REDC round on carry-save limb list t (u32,
    contributions far below 2^32): t <- (t + m*p) >> 16."""
    m = ((t[0] & MASK) * jnp.uint32(N0)) & MASK
    for j in range(L):
        pj = _P[j]
        if pj == 0:
            continue
        if pj == 1:
            t[j] = t[j] + m
        elif pj == 0xFFFF:                    # m*0xFFFF = (m<<16) - m
            t[j] = t[j] + ((-m) & MASK)
            t[j + 1] = t[j + 1] + m - (m != 0).astype(jnp.uint32)
        else:
            pr = m * jnp.uint32(pj)
            t[j] = t[j] + (pr & MASK)
            t[j + 1] = t[j + 1] + (pr >> W)
    carry0 = t[0] >> W
    t = t[1:] + [jnp.zeros(shape, jnp.uint32)]
    t[0] = t[0] + carry0
    return t


def _cond_sub_wide(limbs, hi, shape):
    """Value = hi*2^256 + limbs (canonical 16-bit limbs) < 2p:
    conditionally subtract p. Returns (limbs, hi) with hi' in {0, hi-?}..."""
    borrow = jnp.zeros(shape, jnp.uint32)
    d = []
    for j in range(L):
        v = limbs[j] - jnp.uint32(_P[j]) - borrow
        d.append(v & MASK)
        borrow = (v >> W) & jnp.uint32(1)
    take = (hi != 0) | (borrow == 0)
    hi2 = jnp.where(take, hi - borrow, hi)
    return [jnp.where(take, d[j], limbs[j]) for j in range(L)], hi2


def _fold_reduce(ds, shape, rounds):
    """37 int32 diagonal arrays (7-bit spacing, each < 2^24, total value
    V < 3p * 2^(16*rounds)) -> L canonical Montgomery uint32 limb arrays of
    V / 2^(16*rounds) mod p."""
    NL = 19                       # 7*36+24 = 276 bits -> 18 limbs (+1 slack)
    t = [jnp.zeros(shape, jnp.uint32) for _ in range(NL)]
    # pair adjacent diagonals: e = d_2i + (d_2i+1 << 7) < 2^24 + 2^31 < 2^32
    pairs = []
    for i in range(0, NPLANES - 1, 2):
        pairs.append((PLANE_BITS * i,
                      ds[i].astype(jnp.uint32) +
                      (ds[i + 1].astype(jnp.uint32) << PLANE_BITS)))
    if NPLANES % 2:
        pairs.append((PLANE_BITS * (NPLANES - 1),
                      ds[NPLANES - 1].astype(jnp.uint32)))
    for bit, e in pairs:
        j, r = divmod(bit, W)
        elo, ehi = e & MASK, e >> W
        c0 = (elo << r) & MASK
        c1 = (((elo >> (W - r)) if r else jnp.zeros_like(e)) |
              ((ehi << r) & MASK)) & MASK
        c2 = (ehi >> (W - r)) if r else jnp.zeros_like(e)
        t[j] = t[j] + c0
        if j + 1 < NL:
            t[j + 1] = t[j + 1] + c1
        if j + 2 < NL:
            t[j + 2] = t[j + 2] + c2

    for _ in range(rounds):
        t = _redc_step(t, shape)

    # value now < 3p < 2^257: carry-normalize, then subtract p twice
    c = jnp.zeros(shape, jnp.uint32)
    out = []
    for j in range(L):
        v = t[j] + c
        out.append(v & MASK)
        c = v >> W
    hi = c + t[L]                 # < 3p/2^256 -> 0 or 1 after carries
    out, hi = _cond_sub_wide(out, hi, shape)
    out, hi = _cond_sub_wide(out, hi, shape)
    return out


def _folded_band_digits(v_limbs, rounds):
    """v[L, k, n] Montgomery limbs -> int8[k, n, NPLANES(d), NPLANES(s)]:
    digit s of w_dk = v_kn * 2^(7d + 16*rounds) * R^{-1} mod p."""
    from . import montgomery as mont
    cs = np.stack([int_to_limbs(pow(2, PLANE_BITS * d + 16 * rounds, P))
                   for d in range(NPLANES)], axis=-1)       # [L, NPLANES]
    c = jnp.asarray(cs.astype(np.uint32)).reshape(L, 1, 1, NPLANES)
    w = mont.mont_mul(v_limbs[..., None], c)                # [L, k, n, 37]
    return _planes7(w)                                       # [k, n, d, s]


def _fused2_kernel(a_ref, w_ref, o_ref, *, k, tn, kcols, rounds):
    """a_ref [L+1, k, TB] uint32 (row L zeros); w_ref [NPLANES*tn, kcols]
    int8 folded band; o_ref [L, tn, TB] canonical Montgomery limbs."""
    TB = a_ref.shape[2]
    blocks = []
    for d in range(NPLANES):
        j, r = divmod(PLANE_BITS * d, W)
        v = a_ref[j] >> r
        if r > W - PLANE_BITS:
            v = v | (a_ref[j + 1] << (W - r))
        blocks.append((v & jnp.uint32(0x7F)).astype(jnp.int8))
    if kcols > k * NPLANES:
        blocks.append(jnp.zeros((kcols - k * NPLANES, TB), jnp.int8))
    planes = jnp.concatenate(blocks, axis=0)                # [kcols, TB]

    d32 = jax.lax.dot_general(
        w_ref[0], planes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [37*tn, TB]

    ds = [d32[s * tn:(s + 1) * tn, :] for s in range(NPLANES)]
    out = _fold_reduce(ds, (tn, TB), rounds)
    o_ref[...] = jnp.stack(out, axis=0)


@functools.lru_cache(maxsize=None)
def _fused2_call(k: int, n: int, bpadded: int, rounds: int):
    TB = 128
    TN = min(n, 128)
    npad = -n % TN
    ntiles = (n + npad) // TN
    kcols = -(-(k * NPLANES) // 32) * 32
    nb = bpadded // TB
    kern = functools.partial(_fused2_kernel, k=k, tn=TN, kcols=kcols,
                             rounds=rounds)
    return pl.pallas_call(
        kern,
        grid=(nb, ntiles),
        in_specs=[
            pl.BlockSpec((L + 1, k, TB), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPLANES * TN, kcols), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, TN, TB), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n + npad, bpadded), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bpadded * kcols * NPLANES * (n + npad),
            bytes_accessed=4 * L * (bpadded * (k + n)) + kcols * NPLANES * n,
            transcendentals=0),
    ), TN, npad


def fused2_fits(k: int, n: int) -> bool:
    """Folded band tile + int32 dot output + a-block must fit VMEM with
    double buffering. Same n >= 4 Mosaic floor as the v1 kernel."""
    if n < 4 or NPLANES * k * 127 * 127 >= 2 ** 31:
        return False
    TN = min(n, 128)
    kcols = -(-(k * NPLANES) // 32) * 32
    band = NPLANES * TN * kcols
    d32 = NPLANES * TN * 128 * 4
    ablk = (L + 1) * k * 128 * 4
    return band + d32 + ablk < 6 * 2 ** 20


def fp_matmul_mxu2(a_limbs, v_limbs):
    """a[L, B, k] @ v[L, k, n] (both Montgomery) -> [L, B, n] via the
    folded-constant int8 MXU kernel. Bit-exact vs the scan/v1 paths
    (tests/test_pallas_field.py)."""
    Lx, B, k = a_limbs.shape
    n = v_limbs.shape[2]
    rounds = _rounds_for(k)
    wd = _folded_band_digits(v_limbs, rounds)      # [k, n, d, s]
    call, TN, npad = _fused2_call(k, n, B + (-B % 128), rounds)
    kcols = -(-(k * NPLANES) // 32) * 32
    if npad:
        wd = jnp.concatenate(
            [wd, jnp.zeros((k, npad, NPLANES, NPLANES), jnp.int8)], axis=1)
    ntiles = (n + npad) // TN
    # W[tile, s*TN + nn, d*k + kk] = wd[kk, tile*TN + nn, d, s]
    w = wd.reshape(k, ntiles, TN, NPLANES, NPLANES)
    w = w.transpose(1, 4, 2, 3, 0).reshape(ntiles, NPLANES * TN, NPLANES * k)
    if kcols > k * NPLANES:
        w = jnp.concatenate(
            [w, jnp.zeros((ntiles, NPLANES * TN, kcols - k * NPLANES),
                          jnp.int8)], axis=2)

    bpad = -B % 128
    at = jnp.swapaxes(a_limbs, 1, 2)               # [L, k, B]
    at = jnp.concatenate(
        [at, jnp.zeros((1, k, B), jnp.uint32)], 0)  # zero high-limb row
    if bpad:
        at = jnp.concatenate(
            [at, jnp.zeros((L + 1, k, bpad), jnp.uint32)], 2)
    out = call(at, w)                              # [L, n+npad, B+bpad]
    return jnp.swapaxes(out[:, :n, :B], 1, 2)


# ---------------------------------------------------------------------------
# Unfused fallback: XLA dot + standalone epilogue
# ---------------------------------------------------------------------------

def fp_matmul_mxu(a_limbs, v_limbs):
    """a[L, B, k] @ v[L, k, n] (both Montgomery) -> [L, B, n] Montgomery.
    MXU path; dispatches to the fused kernel when the band tile fits."""
    Lx, B, k = a_limbs.shape
    n = v_limbs.shape[2]
    if fused_fits(k, n) and not _interpret():
        return fp_matmul_mxu_fused(a_limbs, v_limbs)
    # planes of a: limbs [L, B, k] -> digits [B, k, NPLANES] -> [B, k*37]
    ap = _planes7(a_limbs).reshape(B, k * NPLANES)
    vband = _build_vband(v_limbs)                   # [k*NPLANES, n*NOUT]
    diag = jax.lax.dot_general(
        ap, vband, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)           # [B, n*NOUT]
    diag = diag.reshape(B, n, NOUT)

    # pallas reduction over flattened outputs
    M = B * n
    d = jnp.moveaxis(diag.reshape(M, NOUT), 1, 0)   # [NOUT, M]
    TILE = 1024
    pad = -M % TILE
    if pad:
        d = jnp.concatenate([d, jnp.zeros((NOUT, pad), jnp.int32)], 1)
    g = (M + pad) // TILE
    d = d.reshape(NOUT, g, 8, 128)
    out = pl.pallas_call(
        _redc_kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((NOUT, 1, 8, 128), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, g, 8, 128), jnp.uint32),
        interpret=_interpret(),
    )(d)
    out = out.reshape(L, g * TILE)[:, :M].reshape(L, B, n)
    return out
