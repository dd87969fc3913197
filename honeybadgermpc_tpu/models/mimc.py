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


from functools import lru_cache


@lru_cache(maxsize=None)
def _mimc_scan_jit(n: int, t: int, robust: bool, omega: bool):
    """Cached jitted 161-round MiMC scan (one compile per context params;
    shapes recompile inside jax's own cache)."""
    import jax
    import jax.numpy as jnp

    from ..parallel.reconstruct import sim_batch_reconstruct

    @jax.jit
    def run(x_l, k_l, r_l, r2_l, r3_l, ctr_l):
        three = FpArray.from_int(3)

        def body(inp_l, per_round):
            rl, r2l, r3l, cl = per_round
            inp = FpArray(inp_l)
            r, r2, r3 = FpArray(rl), FpArray(r2l), FpArray(r3l)
            x = inp + FpArray(k_l) + FpArray(cl[..., None])
            e, _nerr = sim_batch_reconstruct(x - r, n, t, omega, robust)
            e2 = e * e
            e3 = e2 * e
            v = (e * three) * r2 + (e2 * three) * r + e3 + r3
            return v.limbs, 0

        out_l, _ = jax.lax.scan(
            body, x_l, (r_l, r2_l, r3_l, jnp.moveaxis(ctr_l, -1, 0)))
        return (FpArray(out_l) + FpArray(k_l)).limbs

    return run


def mimc_mpc_batch_jit(ctx: MpcContext, xs: ShareArray, k) -> ShareArray:
    """mimc_mpc_batch with all 161 rounds inside ONE jitted lax.scan —
    the cube-trick open (sim fused kernels) is traceable, so the whole
    cipher is a single device program instead of 161 dispatches. Sim
    backend only; bit-identical to mimc_mpc_batch."""
    assert ctx.sim, "jitted scan path is for the SimBackend"
    import jax.numpy as jnp

    if isinstance(k, int):
        k = FpArray.from_int(k)
    B = xs.v.shape[-1]
    # one pool take for all rounds, reshaped to the scan axis
    r, r2, r3 = ctx.preproc.get_cubes(ROUND * B)       # [n, ROUND*B] each

    def _rounds(a):
        lead = a.limbs.shape[:-1]
        return jnp.moveaxis(
            a.limbs.reshape(lead + (ROUND, B)), -2, 0)  # [ROUND, L, n, B]

    r_l, r2_l, r3_l = _rounds(r), _rounds(r2), _rounds(r3)
    ctr_l = FpArray.from_ints(list(range(ROUND))).limbs  # [L, ROUND]
    run = _mimc_scan_jit(ctx.n, ctx.t, ctx.robust, ctx.use_omega_powers)
    return ctx.ShareArray(
        FpArray(run(xs.v.limbs, k.limbs, r_l, r2_l, r3_l, ctr_l)), xs.t)


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
    assert kv.shape[-1] == 1
    import jax.numpy as jnp
    limbs = jnp.broadcast_to(kv.limbs, kv.limbs.shape[:-1] + (B,))
    return ctx.ShareArray(FpArray(limbs), key_share.t)
