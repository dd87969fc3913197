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


def _butterfly_perms(k: int):
    """Per-round pairing permutations for the k(log k)^2 network: round r
    uses stride s; returns (idxA [R, k/2], idxB [R, k/2], pout [R, k])
    where pout scatters concat(out_x, out_y) back to positions."""
    import math

    import numpy as np

    rounds = int(math.log2(k))
    idxA, idxB, pout = [], [], []
    for _ in range(rounds):
        stride = 1
        while stride < k:
            a = [p for p in range(k) if (p // stride) % 2 == 0]
            b = [p + stride for p in a]
            idxA.append(a)
            idxB.append(b)
            pout.append(np.argsort(np.concatenate([a, b])))
            stride *= 2
    return (np.asarray(idxA, np.int32), np.asarray(idxB, np.int32),
            np.asarray(pout, np.int32))


from functools import lru_cache


@lru_cache(maxsize=None)
def _butterfly_jit(n: int, t: int, k: int, robust: bool, omega: bool):
    """One jitted lax.scan for the whole k(log k)^2 network: per round a
    gather pairs elements, one Beaver open switches them, a scatter puts
    them back — uniform body, preprocessing passed as scan inputs."""
    import jax
    import jax.numpy as jnp

    from ..parallel.reconstruct import sim_batch_reconstruct

    idxA, idxB, pout = _butterfly_perms(k)
    inv2 = FpArray.from_int(_INV2)

    @jax.jit
    def run(x_l, sb_l, a_l, b_l, ab_l):
        def body(cur_l, per):
            ia, ib, po, sbl, al, bl, abl = per
            x = FpArray(jnp.take(cur_l, ia, axis=-1))
            y = FpArray(jnp.take(cur_l, ib, axis=-1))
            sb, a, b = FpArray(sbl), FpArray(al), FpArray(bl)
            ab = FpArray(abl)
            diff = x - y
            both = jnp.concatenate(
                [(sb - a).limbs, (diff - b).limbs], axis=-1)
            # pad to a multiple of t+1 with zero shares (valid sharings
            # of 0 at any degree) — k need not divide by t+1 at big n
            pad = (-both.shape[-1]) % (t + 1)
            if pad:
                both = jnp.concatenate(
                    [both, jnp.zeros(both.shape[:-1] + (pad,),
                                     both.dtype)], axis=-1)
            opened, _ = sim_batch_reconstruct(
                FpArray(both), n, t, omega, robust)
            h = ia.shape[-1]
            d = FpArray(opened.limbs[..., :h])
            e = FpArray(opened.limbs[..., h:2 * h])
            sdiff = d * e + d * b + e * a + ab
            summ = x + y
            ox = (summ + sdiff) * inv2
            oy = (summ - sdiff) * inv2
            merged = jnp.concatenate([ox.limbs, oy.limbs], axis=-1)
            return jnp.take(merged, po, axis=-1), 0

        out_l, _ = jax.lax.scan(
            body, x_l,
            (jnp.asarray(idxA), jnp.asarray(idxB), jnp.asarray(pout),
             sb_l, a_l, b_l, ab_l))
        return out_l

    return run


def iterated_butterfly_network_jit(ctx: MpcContext, inputs: ShareArray,
                                   k: int) -> ShareArray:
    """iterated_butterfly_network as ONE device dispatch (sim backend).
    Same switching network and preprocessing consumption; swaps are
    decided by the same one-minus-one sbits."""
    assert ctx.sim and k & (k - 1) == 0
    import math

    import jax.numpy as jnp

    rounds = int(math.log2(k))
    R = rounds * rounds
    h = k // 2

    # ONE pool take per kind for the whole epoch, reshaped to the scan
    # axis (R separate takes were 4R dynamic-slice dispatches — on the
    # remote-tunneled chip that host loop was 120x the scan's own 40 ms
    # device time; same one-take precedent as mimc_mpc_batch_jit)
    def _rounds(fp):
        lead = fp.limbs.shape[:-1]
        return jnp.moveaxis(fp.limbs.reshape(lead + (R, h)), -2, 0)

    sb_l = _rounds(ctx.preproc.get_one_minus_ones(R * h))
    a, b, ab = ctx.preproc.get_triples(R * h)
    run = _butterfly_jit(ctx.n, ctx.t, k, ctx.robust, ctx.use_omega_powers)
    out = run(inputs.v.limbs, sb_l, _rounds(a), _rounds(b), _rounds(ab))
    return ctx.ShareArray(FpArray(out), inputs.t)


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
