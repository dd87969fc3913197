"""MiMC block cipher over secret shares (reference progs/mimc.py).

Batched: one call encrypts a whole tensor of message shares in
ROUND = ceil(log3 p) = 161 rounds; each round costs exactly one batched
open (the preprocessed-cube trick, mimc.py:25-30):

    open e = x - r;   x^3 = 3e*r^2 + 3e^2*r + e^3 + r^3
"""

from __future__ import annotations

from math import ceil, log

from ..elliptic_curve import Subgroup
from ..ops.fparray import FpArray
from ..runtime.context import MpcContext, ShareArray

ROUND = ceil(log(Subgroup.BLS12_381, 3))  # 161


def mimc_plain(x: int, k: int) -> int:
    """Plaintext oracle (reference mimc.py:11-15)."""
    p = Subgroup.BLS12_381
    inp = x
    for ctr in range(ROUND):
        inp = pow((inp + k + ctr) % p, 3, p)
    return (inp + k) % p


def cube_shares(ctx: MpcContext, x: ShareArray) -> ShareArray:
    B = x.v.shape[-1]
    r, r2, r3 = (ctx.from_preproc(s) for s in ctx.preproc.get_cubes(B))
    e = (x - r).open()
    e2 = e * e
    e3 = e2 * e
    three = FpArray.from_int(3)
    v = (e * three) * r2.v + (e2 * three) * r.v + e3 + r3.v
    return ctx.ShareArray(v, x.t)


def mimc_mpc_batch(ctx: MpcContext, xs: ShareArray, k) -> ShareArray:
    """Encrypt share tensor xs under public key k (reference mimc.py:40-64).
    161 sequential rounds, each one batched open."""
    if isinstance(k, int):
        k = FpArray.from_int(k)
    inp = xs
    for ctr in range(ROUND):
        inp = cube_shares(ctx, inp + (k + FpArray.from_int(ctr)))
    return inp + k


def mimc_encrypt_ctr(ctx: MpcContext, key_share: ShareArray, nonce: int,
                     blocks: ShareArray) -> ShareArray:
    """MiMC-CTR symmetric encryption over a SHARED key (reference
    progs/mimc_symmetric.py): ciphertext_i = block_i + MiMC_k(nonce + i).
    Requires shared-key MiMC: each round input includes the key share."""
    B = blocks.v.shape[-1]
    ctr_pub = FpArray.from_ints([nonce + i for i in range(B)])
    pads = mimc_mpc_shared_key(ctx, ctr_pub, key_share)
    return blocks + pads


def mimc_mpc_shared_key(ctx: MpcContext, xs_pub: FpArray,
                        key_share: ShareArray) -> ShareArray:
    """MiMC with public input and SHARED key (used by mimc_jubjub PKC and
    symmetric mode). x starts public; after the first round it is a share."""
    B = xs_pub.shape[-1]
    kb = _broadcast_key(ctx, key_share, B)
    inp = kb + xs_pub
    inp = cube_shares(ctx, inp)
    for ctr in range(1, ROUND):
        inp = cube_shares(ctx, inp + kb + FpArray.from_int(ctr))
    return inp + kb


def _broadcast_key(ctx: MpcContext, key_share: ShareArray, B: int) -> ShareArray:
    kv = key_share.v
    lead = kv.shape[0:1] if ctx.sim else ()
    assert kv.shape[-1] == 1
    import jax.numpy as jnp
    limbs = jnp.broadcast_to(kv.limbs, kv.limbs.shape[:-1] + (B,))
    return ctx.ShareArray(FpArray(limbs), key_share.t)
