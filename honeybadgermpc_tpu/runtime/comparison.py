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


def install(ctx: MpcContext):
    """Register comparison mixins on a context (mixin-config injection,
    mpc.py:84-99)."""
    ctx.config[MixinConstants.ShareEquality] = \
        lambda c, x, y: equality(c, x, y)
    return ctx
