"""Secure comparison mixins: Equality (Legendre) and LessThan (Reistad'07).

Reference: progs/mixins/share_comparison.py (Equality :9-80, LessThan
:83-212). Batched redesign: the reference evaluates the 32 Legendre test
bits with 32 concurrent asyncio opens per element; here the security
parameter is just one more tensor axis and everything is a handful of
batched opens.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.fparray import FpArray
from ..ops.limbs import P
from .context import MixinConstants, MpcContext, ShareArray, beaver_multiply_arrays


def legendre_fp(c: FpArray) -> FpArray:
    """Legendre symbol of public values as field elements in {1, p-1}
    (0 maps to 0) — c^((p-1)/2)."""
    return c.pow_static((P - 1) // 2)


def equality(ctx: MpcContext, x: ShareArray, y: ShareArray,
             security_parameter: int = 32):
    """Probabilistic equality test -> share of 1 (equal) / 0 (not equal).

    Per test bit s (share_comparison.py:33-62): with shared bit b and rands
    r, rp:  _b = 5 - 4b in {1, 5} (5 is a QNR);
    c = open(diff*r + _b*rp^2) is a QR "iff" diff==0 xor b-side coin.
    test_bit = (leg(c)/2) * (_b + leg(c)); result = AND (product tree).

    The reference retries when c == 0 (probability ~ 2^-254 per bit);
    here that event is treated as "agree" — its probability is far below
    the protocol's 2^-32 soundness anyway."""
    s = security_parameter
    diff = x - y
    B = diff.v.shape[-1]

    b = ctx.from_preproc(ctx.preproc.get_bits(B * s))        # [n?, B*s]
    r = ctx.from_preproc(ctx.preproc.get_rands(B * s))
    rp = ctx.from_preproc(ctx.preproc.get_rands(B * s))

    _b = (-4) * b + 5                                        # in {1, 5}
    diff_rep = _repeat_last(ctx, diff, s)                    # [n?, B*s]
    rp2_b = beaver_multiply_arrays(ctx, beaver_multiply_arrays(ctx, rp, rp), _b)
    c = ctx.open_share_array(
        beaver_multiply_arrays(ctx, diff_rep, r) + rp2_b)    # public [.., B*s]

    leg = legendre_fp(c)                                     # {1, p-1} (0 if c=0)
    # treat c == 0 as "equal" vote: leg := 1 there
    leg = FpArray.select(c.is_zero(), FpArray.from_int(1).broadcast_to(leg.shape), leg)
    inv2 = FpArray.from_int(pow(2, P - 2, P))
    # test bit per (element, s): 0 with prob 1/4 when different; never 0
    # when equal (reference semantics: the final product opens NONZERO iff
    # equal — callers truth-test, share_comparison.py:62 + test usage)
    test = ctx.ShareArray((_b.v + leg) * (leg * inv2), x.t)

    # product of the s test bits per element: log2(s) batched multiply
    # rounds (multiplicative_product / _tree_fold, dataflow.py:237-288)
    cur = test
    width = s
    while width > 1:
        half = width // 2
        v = cur.v.limbs.reshape(cur.v.limbs.shape[:-1] + (B, width))
        even = v[..., 0:half * 2:2].reshape(v.shape[:-2] + (B * half,))
        odd = v[..., 1:half * 2:2].reshape(v.shape[:-2] + (B * half,))
        prod = beaver_multiply_arrays(
            ctx, ctx.ShareArray(FpArray(even), cur.t),
            ctx.ShareArray(FpArray(odd), cur.t))
        if width % 2:
            pv = prod.v.limbs.reshape(v.shape[:-2] + (B, half))
            merged = jnp.concatenate([pv, v[..., width - 1:width]], axis=-1)
            cur = ctx.ShareArray(
                FpArray(merged.reshape(v.shape[:-2] + (B * (half + 1),))), cur.t)
            width = half + 1
        else:
            cur = prod
            width = half
    return cur


def _repeat_last(ctx, sa: ShareArray, s: int) -> ShareArray:
    """[.., B] -> [.., B*s] (each element repeated s times, grouped by s:
    layout [B, s] flattened)."""
    v = sa.v.limbs[..., :, None]
    v = jnp.broadcast_to(v, v.shape[:-1] + (s,))
    v = v.reshape(v.shape[:-2] + (v.shape[-2] * s,))
    return ctx.ShareArray(FpArray(v), sa.t)


BIT_LENGTH = 255  # p.bit_length()


def public_bits(c: FpArray, nbits: int = BIT_LENGTH) -> FpArray:
    """Public values -> 0/1 field elements of their bits, LSB first on a new
    trailing axis: [.., B] -> [.., B, nbits]."""
    from ..ops import montgomery as mont
    from ..ops.limbs import L, W
    plain = mont.from_mont(c.limbs)                   # [L, .., B] 16-bit limbs
    limb_idx = jnp.arange(nbits) // W
    bit_idx = jnp.arange(nbits) % W
    sel = jnp.take(plain, limb_idx, axis=0)           # [nbits, .., B]
    bits = (sel >> bit_idx.reshape((nbits,) + (1,) * (plain.ndim - 1))) & 1
    bits = jnp.moveaxis(bits, 0, -1)                  # [.., B, nbits]
    one = FpArray.from_int(1).broadcast_to(bits.shape)
    zero = FpArray.from_int(0).broadcast_to(bits.shape)
    return FpArray.select(bits != 0, one, zero)


def public_lt_const(c: FpArray, bound: int):
    """bool mask: int value of public c < bound (lexicographic limb
    compare against a host constant)."""
    from ..ops import montgomery as mont
    from ..ops.limbs import L, int_to_limbs
    plain = mont.from_mont(c.limbs)
    b = int_to_limbs(bound)
    lt = jnp.zeros(plain.shape[1:], bool)
    decided = jnp.zeros(plain.shape[1:], bool)
    for j in reversed(range(L)):
        bj = jnp.uint32(int(b[j]))
        lt = jnp.where(~decided & (plain[j] < bj), True, lt)
        decided = decided | (plain[j] != bj)
    return lt


def _xor_pub(share_v: FpArray, cbit: FpArray) -> FpArray:
    """share XOR public bit, locally: c + r(1 - 2c)."""
    one = FpArray.from_int(1)
    return cbit + share_v * (one - cbit - cbit)


def _xor_shares(ctx, a: ShareArray, b: ShareArray) -> ShareArray:
    """a + b - 2ab (share_comparison.py:113-117) — one batched multiply."""
    ab = beaver_multiply_arrays(ctx, a, b)
    return a + b - ab - ab


def less_than(ctx: MpcContext, a: ShareArray, b: ShareArray) -> ShareArray:
    """Reistad'07 comparison (share_comparison.py:83-212): share of 1 iff
    a < b. Requires a, b < (p-1)/2.

    Batched redesign: the 255-bit axis is an element axis; the reference's
    254 SEQUENTIAL suffix-product multiplications (:155-157) become log2
    Hillis-Steele rounds of batched multiplies."""
    B = a.v.shape[-1]
    K = BIT_LENGTH
    z = a - b

    # 5.1 transform: open c = 2z + r, with bitwise-shared r
    r_b, r_bits = ctx.preproc.get_share_bits(B)       # [n?, B], [n?, B, K]
    r_b = ctx.from_preproc(r_b)
    r_bits = ctx.from_preproc(r_bits)
    c = ctx.open_share_array(z + z + r_b)             # public [.., B]
    c_bits = public_bits(c, K)                        # [.., B, K]

    # 5.2 compute x: suffix products of (1 + r_j xor c_j) for j > i
    xor = ctx.ShareArray(_xor_pub(r_bits.v, c_bits), r_bits.t)
    pb = xor + 1                                      # in {1, 2}
    # suffix product over the bit axis, exclusive (powers[i] = prod_{j>i})
    suffix = _exclusive_suffix_product(ctx, pb)       # [.., B, K]
    one = FpArray.from_int(1)
    r1c = ctx.ShareArray(r_bits.v * (one - c_bits), r_bits.t)
    terms = beaver_multiply_arrays(ctx, r1c, suffix)
    x = ctx.ShareArray(_sum_last(terms.v), a.t)       # [.., B]

    # 5.3 extract lsb of x via a second bitwise-shared mask s
    s_b, s_bits = ctx.preproc.get_share_bits(B)
    s_b = ctx.from_preproc(s_b)
    s_bits = ctx.from_preproc(s_bits)
    d = ctx.open_share_array(s_b + x)                 # public
    s_0 = _bit(ctx, s_bits, 0)
    s_1 = _bit(ctx, s_bits, K - 1)
    s_2 = _bit(ctx, s_bits, K - 2)
    s_prod = beaver_multiply_arrays(ctx, s_1, s_2)
    d_bits = public_bits(d, 1)
    d0 = FpArray(d_bits.limbs[..., 0])                # public bit of d
    hi1, hi2 = 1 << (K - 1), 1 << (K - 2)
    x1 = _xor_bits_pub(d0, public_lt_const(d, hi1))
    x2 = _xor_bits_pub(d0, public_lt_const(d, hi2))
    x12 = _xor_bits_pub(d0, public_lt_const(d, hi1 + hi2))
    d_0 = ctx.ShareArray(
        (one - s_1.v - s_2.v + s_prod.v) * d0
        + (s_2.v - s_prod.v) * x2
        + (s_1.v - s_prod.v) * x1
        + s_prod.v * x12, a.t)
    x_0 = _xor_shares(ctx, s_0, d_0)

    # result = c_0 xor r_0 xor x_0
    c0 = FpArray(c_bits.limbs[..., 0])
    r_0 = _bit(ctx, r_bits, 0)
    cr = ctx.ShareArray(_xor_pub(r_0.v, c0), a.t)
    return _xor_shares(ctx, cr, x_0)


def _exclusive_suffix_product(ctx, pb: ShareArray) -> ShareArray:
    """powers[i] = prod_{j > i} pb[j] along the last axis.

    Work-efficient Brent-Kung (Blelloch) scan: ~2K Beaver multiplies in
    2*log2(K) rounds — vs the reference's K SEQUENTIAL multiplies
    (share_comparison.py:155-157) and Hillis-Steele's K*log2(K) total work.
    The bit axis is reversed so the suffix becomes an exclusive prefix,
    padded with identity sharings to the next power of two."""
    K = pb.v.shape[-1]
    Kp = 1 << max(1, (K - 1).bit_length())
    t = pb.t
    v = pb.v.limbs[..., ::-1]
    if Kp > K:
        pad = FpArray.from_int(1).broadcast_to(pb.v.shape[:-1] + (Kp - K,))
        v = jnp.concatenate([v, pad.limbs], axis=-1)

    def bmul(lv, rv):
        prod = beaver_multiply_arrays(
            ctx, ctx.ShareArray(FpArray(lv), t), ctx.ShareArray(FpArray(rv), t))
        return prod.v.limbs

    # upsweep: fold pair products up the tree (one batched multiply/level)
    d = 1
    while d < Kp:
        left = v[..., d - 1::2 * d]
        right = v[..., 2 * d - 1::2 * d]
        v = v.at[..., 2 * d - 1::2 * d].set(bmul(right, left))
        d *= 2
    # clear the root to the identity, then downsweep
    one = FpArray.from_int(1).broadcast_to(pb.v.shape[:-1])
    v = v.at[..., Kp - 1].set(one.limbs)
    d = Kp // 2
    while d >= 1:
        left = v[..., d - 1::2 * d]
        right = v[..., 2 * d - 1::2 * d]
        v = v.at[..., d - 1::2 * d].set(right)
        v = v.at[..., 2 * d - 1::2 * d].set(bmul(right, left))
        d //= 2
    out = v[..., :K][..., ::-1]
    return ctx.ShareArray(FpArray(out), t)


def _exclusive_suffix_product_hs(ctx, pb: ShareArray) -> ShareArray:
    """Hillis-Steele variant (log2(K) rounds, K*log2(K) multiplies) — kept
    as the parity oracle for the Brent-Kung scan and for latency-bound
    callers that prefer fewer rounds over triple consumption."""
    K = pb.v.shape[-1]
    # inclusive-from-the-right, shifted: start with pb shifted left by one
    cur = _shift_left_fill_one(ctx, pb, 1)
    shift = 1
    while shift < K:
        shifted = _shift_left_fill_one(ctx, cur, shift)
        cur = beaver_multiply_arrays(ctx, cur, shifted)
        shift *= 2
    return cur


def _shift_left_fill_one(ctx, sa: ShareArray, k: int) -> ShareArray:
    """out[..., i] = sa[..., i+k] (fill with constant-1 sharing)."""
    K = sa.v.shape[-1]
    k = min(k, K)
    v = sa.v.limbs[..., k:]
    ones = FpArray.from_int(1).broadcast_to(sa.v.shape[:-1] + (k,))
    out = jnp.concatenate([v, ones.limbs], axis=-1)
    return ctx.ShareArray(FpArray(out), sa.t)


def _sum_last(v: FpArray) -> FpArray:
    """Tree-sum over the last axis (local additions)."""
    K = v.shape[-1]
    while K > 1:
        half = K // 2
        a = FpArray(v.limbs[..., 0:half * 2:2])
        b = FpArray(v.limbs[..., 1:half * 2:2])
        s = a + b
        if K % 2:
            s = FpArray.concatenate([s, FpArray(v.limbs[..., K - 1:K])],
                                    axis=s.ndim - 1)
            K = half + 1
        else:
            K = half
        v = s
    return FpArray(v.limbs[..., 0])


def _bit(ctx, bits: ShareArray, i: int) -> ShareArray:
    return ctx.ShareArray(FpArray(bits.v.limbs[..., i]), bits.t)


def _xor_bits_pub(a: FpArray, b_mask) -> FpArray:
    """public bit (field 0/1) XOR bool mask -> field 0/1."""
    b = FpArray.select(b_mask, FpArray.from_int(1).broadcast_to(a.shape),
                       FpArray.from_int(0).broadcast_to(a.shape))
    two = FpArray.from_int(2)
    return a + b - two * a * b


def install(ctx: MpcContext):
    """Register comparison mixins on a context (mixin-config injection,
    mpc.py:84-99)."""
    ctx.config[MixinConstants.ShareEquality] = \
        lambda c, x, y: equality(c, x, y)
    ctx.config[MixinConstants.ShareLessThan] = \
        lambda c, x, y: less_than(c, x, y)
    return ctx
