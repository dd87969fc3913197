"""Secure fixed-point arithmetic (Catrina-Saxena, FC'10).

Reference: progs/fixedpoint.py (params :24-35, random2m :91, trunc_pr :108,
get_carry_bit :131, bit_ltl :163, div2m :184, trunc :208, FixedPoint :214).
Batched: a FixedPointArray wraps a ShareArray tensor; the carry-computation
tree over the 2^m bit axis runs as log-depth *batched* multiply rounds.

F = 32 fraction bits, K = 64 total bits, KAPPA = 32 statistical security —
like the reference, opening masked values leaks O(2^-KAPPA) per op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..elliptic_curve import Subgroup
from ..ops.fparray import FpArray
from ..runtime.context import MpcContext, ShareArray, beaver_multiply_arrays

F = 32
KAPPA = 32
K = 64
p = Subgroup.BLS12_381


def to_fixed_point_repr(x: float, f: int = F) -> int:
    return int(x * 2 ** f)


def from_fixed_point_repr(x: int, k: int = K, f: int = F, signed=True) -> float:
    x = int(x)
    if signed and x >= 2 ** (k - 1):
        x = -(p - x)
    return float(x) / 2 ** f


def random2m(ctx: MpcContext, B: int, m: int):
    """m-bit random share per element: (value share [.., B],
    bit shares [.., B, m] LSB first) — fixedpoint.py:91-98 batched."""
    bits = ctx.preproc.get_bits(B * m)                       # [n?, B*m]
    lead = bits.shape[:ctx.lead]
    bits = bits.reshape(lead + (B, m))
    weights = FpArray.from_ints([1 << i for i in range(m)])  # [m]
    val = _sum_last(bits * weights)
    return ctx.ShareArray(val), ctx.ShareArray(bits)


def trunc_pr(ctx: MpcContext, x: ShareArray, k: int, m: int) -> ShareArray:
    """Probabilistic truncation of the low m bits (fixedpoint.py:108-120)."""
    assert k > m
    B = x.v.shape[-1]
    r1, _ = random2m(ctx, B, m)
    r2, _ = random2m(ctx, B, k + KAPPA - m)
    r2v = r2.v * FpArray.from_int(1 << m)
    c = ctx.open_share_array(
        ctx.ShareArray(x.v + FpArray.from_int(1 << (k - 1)) + r1.v + r2v, x.t))
    c2 = _mod_2m(c, m)                                       # public
    inv2m = FpArray.from_int(pow(1 << m, p - 2, p))
    return ctx.ShareArray((x.v - c2 + r1.v) * inv2m, x.t)


def get_carry_bit(ctx: MpcContext, a_bits: ShareArray, b_bits: ShareArray,
                  low_carry_bit: int = 1) -> ShareArray:
    """Carry-out of a + b over bit tensors [.., B, m] (LSB first), via the
    (carry, all_one) combine tree — fixedpoint.py:131-160, with each tree
    level one batched multiply round."""
    # reference reverses to MSB-first; combine(left=more significant, right)
    carry = beaver_multiply_arrays(ctx, a_bits, b_bits)
    allone = ctx.ShareArray(
        a_bits.v + b_bits.v - carry.v - carry.v, a_bits.t)
    # append the low carry-in as the least significant element, then make
    # the tree axis MSB-first
    lead = carry.v.shape[:-1]
    lcb = FpArray.from_int(low_carry_bit).broadcast_to(lead[:-0] + (1,)) \
        if False else FpArray.from_int(low_carry_bit).broadcast_to(carry.v.shape[:-1] + (1,))
    zero = FpArray.from_int(0).broadcast_to(carry.v.shape[:-1] + (1,))
    c = FpArray.concatenate([lcb, FpArray(carry.v.limbs)], axis=carry.v.ndim - 1)
    o = FpArray.concatenate([zero, FpArray(allone.v.limbs)], axis=carry.v.ndim - 1)
    # reverse -> MSB first
    c = FpArray(c.limbs[..., ::-1])
    o = FpArray(o.limbs[..., ::-1])
    cs, os = ctx.ShareArray(c, a_bits.t), ctx.ShareArray(o, a_bits.t)
    m = c.shape[-1]
    while m > 1:
        half = m // 2
        cl, cr = _pairs(ctx, cs)
        ol, orr = _pairs(ctx, os)
        oc = beaver_multiply_arrays(ctx, ol, cr)
        oo = beaver_multiply_arrays(ctx, ol, orr)
        nc = cl + oc
        no = oo
        if m % 2:
            nc = _append_last(ctx, nc, cs)
            no = _append_last(ctx, no, os)
            m = half + 1
        else:
            m = half
        cs, os = nc, no
    return ctx.ShareArray(FpArray(cs.v.limbs[..., 0]), a_bits.t)


def bit_ltl(ctx: MpcContext, a: FpArray, b_bits: ShareArray) -> ShareArray:
    """Share of [b < a] for public a[.., B] and bitwise-shared b [.., B, m]
    (fixedpoint.py:163-181)."""
    m = b_bits.v.shape[-1]
    nb = ctx.ShareArray(1 - b_bits.v, b_bits.t)              # 1 - b_i
    a_bits = _public_bits_field(a, m)                        # [.., B, m]
    a_sh = ctx.ShareArray(a_bits.broadcast_to(nb.v.shape) if a_bits.shape != nb.v.shape else a_bits, b_bits.t)
    carry = get_carry_bit(ctx, a_sh, nb)
    return ctx.ShareArray(1 - carry.v, carry.t)


def div2m(ctx: MpcContext, x: ShareArray, k: int, m: int) -> ShareArray:
    """Share of [x mod 2^m] (fixedpoint.py:184-193; the reference's naming
    keeps div2m = remainder, trunc = quotient)."""
    B = x.v.shape[-1]
    r1, r1_bits = random2m(ctx, B, m)
    r2, _ = random2m(ctx, B, k + KAPPA - m)
    r2v = r2.v * FpArray.from_int(1 << m)
    c = ctx.open_share_array(ctx.ShareArray(
        x.v + r2v + r1.v + FpArray.from_int(1 << (k - 1)), x.t))
    c2 = _mod_2m(c, m)
    u = bit_ltl(ctx, c2, r1_bits)
    return ctx.ShareArray(c2 - r1.v + FpArray.from_int(1 << m) * u.v, x.t)


def trunc(ctx: MpcContext, x: ShareArray, k: int, m: int) -> ShareArray:
    """Share of [x // 2^m] (fixedpoint.py:208-211)."""
    a2 = div2m(ctx, x, k, m)
    inv2m = FpArray.from_int(pow(1 << m, p - 2, p))
    return ctx.ShareArray((x.v - a2.v) * inv2m, x.t)


class FixedPointArray:
    """Batched fixed-point numbers over shares (fixedpoint.py:214-286)."""

    def __init__(self, ctx: MpcContext, x):
        self.ctx = ctx
        if isinstance(x, ShareArray):
            self.share = x
        elif isinstance(x, (list, tuple, np.ndarray)):
            reps = [to_fixed_point_repr(float(v)) % p for v in x]
            B = len(reps)
            zero = ctx.from_preproc(ctx.preproc.get_zeros(B))
            self.share = ctx.ShareArray(
                zero.v + FpArray.from_ints(reps), zero.t)
        else:
            raise NotImplementedError(type(x))

    def __add__(self, o):
        return FixedPointArray(self.ctx, self.share + o.share)

    def __sub__(self, o):
        return FixedPointArray(self.ctx, self.share - o.share)

    def neg(self):
        return FixedPointArray(self.ctx, -1 * self.share)

    def __mul__(self, o):
        prod = self.share * o.share
        return FixedPointArray(self.ctx, trunc_pr(self.ctx, prod, 2 * K, F))

    def div(self, c):
        assert isinstance(c, (int, float))
        B = self.share.v.shape[-1]
        return self * FixedPointArray(self.ctx, [1.0 / c] * B)

    def ltz(self) -> ShareArray:
        """Share of [self < 0] (fixedpoint.py:266-268)."""
        t = trunc(self.ctx, self.share, K, K - 1)
        return self.ctx.ShareArray(-t.v, t.t)

    def lt(self, o) -> ShareArray:
        return (self - o).ltz()

    def open(self) -> np.ndarray:
        vals = self.ctx.open_share_array(self.share).to_ints()
        flat = vals.reshape(-1)
        out = np.array([from_fixed_point_repr(v) for v in flat])
        return out.reshape(vals.shape)


# -- helpers -----------------------------------------------------------------

def _sum_last(v: FpArray) -> FpArray:
    from ..runtime.comparison import _sum_last as s
    return s(v)


def _pairs(ctx, sa: ShareArray):
    m = sa.v.shape[-1]
    half = m // 2
    l = ctx.ShareArray(FpArray(sa.v.limbs[..., 0:half * 2:2]), sa.t)
    r = ctx.ShareArray(FpArray(sa.v.limbs[..., 1:half * 2:2]), sa.t)
    return l, r


def _append_last(ctx, sa: ShareArray, src: ShareArray):
    m = src.v.shape[-1]
    tail = FpArray(src.v.limbs[..., m - 1:m])
    return ctx.ShareArray(
        FpArray.concatenate([sa.v, tail], axis=sa.v.ndim - 1), sa.t)


def _mod_2m(c: FpArray, m: int) -> FpArray:
    """Public c mod 2^m as a field element."""
    from ..ops import montgomery as mont
    from ..ops.limbs import L, W, int_to_limbs
    plain = mont.from_mont(c.limbs)
    keep = []
    for j in range(L):
        lo = j * W
        if lo + W <= m:
            keep.append(plain[j])
        elif lo < m:
            keep.append(plain[j] & jnp.uint32((1 << (m - lo)) - 1))
        else:
            keep.append(jnp.zeros_like(plain[j]))
    masked = jnp.stack(keep, 0)
    return FpArray(mont.to_mont(masked))


def _public_bits_field(a: FpArray, m: int) -> FpArray:
    from ..runtime.comparison import public_bits
    return public_bits(a, m)
