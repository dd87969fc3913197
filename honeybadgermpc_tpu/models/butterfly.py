"""Butterfly switching network for share shuffling (reference
apps/asynchromix/butterfly_network.py:9-118).

Each switch consumes one +-1-shared sbit s and maps (a, b) to
((a+b+s(a-b))/2, (a+b-s(a-b))/2) — a swap iff s == -1. A round of k/2
switches is ONE batched Beaver multiply; the k(log k)^2 network is
log2(k) iterations of a log2(k)-round butterfly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.fparray import FpArray
from ..ops.limbs import P
from ..runtime.context import MpcContext, ShareArray, beaver_multiply_arrays

_INV2 = pow(2, P - 2, P)


def batch_switch(ctx: MpcContext, xs: ShareArray, ys: ShareArray,
                 sbits: ShareArray):
    """Vectorized switches (butterfly_network.py:9-19): returns (out_x,
    out_y) with per-pair swap decided by the +-1 sbit share."""
    inv2 = FpArray.from_int(_INV2)
    diff = xs - ys
    sdiff = beaver_multiply_arrays(ctx, sbits, diff)
    summ = xs + ys
    out_x = ctx.ShareArray((summ.v + sdiff.v) * inv2, xs.t)
    out_y = ctx.ShareArray((summ.v - sdiff.v) * inv2, xs.t)
    return out_x, out_y


def butterfly_round(ctx: MpcContext, inputs: ShareArray, sbits: ShareArray,
                    stride: int):
    """One round: pair elements at the given stride and switch."""
    v = inputs.v.limbs                       # [L, n?, k]
    k = v.shape[-1]
    group = 2 * stride
    blocks = v.reshape(v.shape[:-1] + (k // group, 2, stride))
    xs = ctx.ShareArray(FpArray(
        blocks[..., 0, :].reshape(v.shape[:-1] + (k // 2,))), inputs.t)
    ys = ctx.ShareArray(FpArray(
        blocks[..., 1, :].reshape(v.shape[:-1] + (k // 2,))), inputs.t)
    ox, oy = batch_switch(ctx, xs, ys, sbits)
    oxb = ox.v.limbs.reshape(v.shape[:-1] + (k // group, 1, stride))
    oyb = oy.v.limbs.reshape(v.shape[:-1] + (k // group, 1, stride))
    merged = jnp.concatenate([oxb, oyb], axis=-2).reshape(v.shape)
    return ctx.ShareArray(FpArray(merged), inputs.t)


def iterated_butterfly_network(ctx: MpcContext, inputs: ShareArray,
                               k: int) -> ShareArray:
    """log2(k) iterations of a log2(k)-round butterfly
    (butterfly_network.py:22-53). Consumes k/2 * log2(k)^2 one-minus-one
    preprocessing bits."""
    assert k & (k - 1) == 0, "k must be a power of 2"
    import math
    rounds = int(math.log2(k))
    cur = inputs
    for _ in range(rounds):
        stride = 1
        while stride < k:
            sb = ctx.from_preproc(ctx.preproc.get_one_minus_ones(k // 2))
            cur = butterfly_round(ctx, cur, sb, stride)
            stride *= 2
    return cur
