"""Montgomery-form GF(p) arithmetic kernels in JAX (VPU path).

These are the scalar-free, fully vectorized building blocks that everything
else (NTT, Reed-Solomon, reconstruction, MPC ops) lowers to. Each function
operates on a Python list of ``L`` uint32 jnp arrays (one per 16-bit limb);
the limb loop is unrolled at trace time so XLA sees a flat chain of
elementwise uint32 ops over the batch axes — ideal for VPU fusion. The
stacked ``uint32[L, *shape]`` storage form is converted to/from lists at
kernel entry (see :mod:`honeybadgermpc_tpu.ops.fparray`).

Reference semantics: honeybadgermpc/field.py:68-233 (GFElement algebra) and
honeybadgermpc/ntl/rsdecode_impl.h (the NTL ZZ_p compute core). This is a
ground-up redesign for TPU, not a port: NTL's arbitrary-precision ZZ_p becomes
fixed 16x16-bit limb vectors in Montgomery form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import L, MASK, N0, P, P_LIMBS, R_MOD_P_LIMBS, R2_MOD_P_LIMBS, W

_U32 = jnp.uint32


def _const(limb_value: int):
    return _U32(limb_value)


_P = [int(x) for x in P_LIMBS]


def broadcast_shape(a, b):
    return jnp.broadcast_shapes(jnp.shape(a[0]), jnp.shape(b[0]))


def zeros_list(shape):
    z = jnp.zeros(shape, _U32)
    return [z for _ in range(L)]


def sub_raw(a, b):
    """256-bit subtract with borrow chain. Returns (limbs, borrow in {0,1})."""
    borrow = jnp.zeros(broadcast_shape(a, b), _U32)
    out = []
    for j in range(L):
        t = a[j] - b[j] - borrow          # uint32 wraparound on negative
        out.append(t & MASK)
        borrow = (t >> W) & _const(1)     # wrapped => high half is 0xFFFF
    return out, borrow


def add_raw(a, b):
    """256-bit add with carry chain. Returns (limbs, carry)."""
    carry = jnp.zeros(broadcast_shape(a, b), _U32)
    out = []
    for j in range(L):
        t = a[j] + b[j] + carry
        out.append(t & MASK)
        carry = t >> W
    return out, carry


def _sub_p(a):
    """a - P with borrow chain (P is a compile-time constant)."""
    borrow = jnp.zeros(jnp.shape(a[0]), _U32)
    out = []
    for j in range(L):
        t = a[j] - _const(_P[j]) - borrow
        out.append(t & MASK)
        borrow = (t >> W) & _const(1)
    return out, borrow


def _add_p(a):
    carry = jnp.zeros(jnp.shape(a[0]), _U32)
    out = []
    for j in range(L):
        t = a[j] + _const(_P[j]) + carry
        out.append(t & MASK)
        carry = t >> W
    return out, carry


def cond_sub_p(a, hi):
    """Reduce a (value hi*2^256 + a < 2p) into [0, p)."""
    d, borrow = _sub_p(a)
    take = (hi != 0) | (borrow == 0)
    return [jnp.where(take, d[j], a[j]) for j in range(L)]


def add_mod(a, b):
    s, carry = add_raw(a, b)
    return cond_sub_p(s, carry)


def sub_mod(a, b):
    d, borrow = sub_raw(a, b)
    dp, _ = _add_p(d)
    nz = borrow != 0
    return [jnp.where(nz, dp[j], d[j]) for j in range(L)]


def neg_mod(a):
    """p - a, with -0 = 0."""
    is_zero = is_zero_mask(a)
    d, _ = sub_raw([jnp.broadcast_to(_const(_P[j]), jnp.shape(a[0])) for j in range(L)], a)
    return [jnp.where(is_zero, jnp.zeros_like(d[j]), d[j]) for j in range(L)]


def is_zero_mask(a):
    acc = a[0]
    for j in range(1, L):
        acc = acc | a[j]
    return acc == 0


def eq_mask(a, b):
    acc = (a[0] ^ b[0])
    for j in range(1, L):
        acc = acc | (a[j] ^ b[j])
    return acc == 0


def mont_mul(a, b):
    """CIOS Montgomery multiply: returns a*b*R^{-1} mod p, canonical (< p).

    All intermediate sums fit uint32 because limbs are 16-bit:
    t + a_i*b_j + c <= (2^16-1)^2 + 2(2^16-1) = 2^32 - 1.
    """
    shape = broadcast_shape(a, b)
    zero = jnp.zeros(shape, _U32)
    t = [zero] * (L + 2)
    for i in range(L):
        ai = a[i]
        c = zero
        for j in range(L):
            tmp = t[j] + ai * b[j] + c
            t[j] = tmp & MASK
            c = tmp >> W
        tmp = t[L] + c
        t[L] = tmp & MASK
        t[L + 1] = t[L + 1] + (tmp >> W)
        # reduction step
        m = (t[0] * _const(N0)) & MASK
        c = (t[0] + m * _const(_P[0])) >> W
        for j in range(1, L):
            tmp = t[j] + m * _const(_P[j]) + c
            t[j - 1] = tmp & MASK
            c = tmp >> W
        tmp = t[L] + c
        t[L - 1] = tmp & MASK
        t[L] = t[L + 1] + (tmp >> W)
        t[L + 1] = zero
    return cond_sub_p(t[:L], t[L])


def mont_sqr(a):
    return mont_mul(a, a)


def const_list(limbs_np, shape=()):
    """Compile-time uint32[L] numpy limbs -> broadcasted list form."""
    return [jnp.broadcast_to(_const(int(limbs_np[j])), shape) for j in range(L)]


def to_mont(a):
    """Plain residue -> Montgomery form. Works for any 256-bit input
    (also the uniform-sampling reduction path): returns (a mod p)*R mod p."""
    return mont_mul(a, const_list(R2_MOD_P_LIMBS, jnp.shape(a[0])))


def from_mont(a):
    """Montgomery form -> plain residue in [0, p)."""
    one = [jnp.broadcast_to(_const(1 if j == 0 else 0), jnp.shape(a[0])) for j in range(L)]
    return mont_mul(a, one)


def one_mont(shape=()):
    return const_list(R_MOD_P_LIMBS, shape)


def select(mask, a, b):
    """Elementwise select between two limb lists (mask broadcasts)."""
    return [jnp.where(mask, a[j], b[j]) for j in range(L)]


_POW_UNROLL_LIMIT = 18  # exponents with few ops get unrolled for fusion


def pow_const(a, e: int):
    """a**e for a compile-time Python int exponent. Small exponents unroll
    (best fusion); large ones lower to a lax.scan over the bit string so the
    HLO contains exactly one squaring + one multiply regardless of e —
    essential for compile time (a^(p-2) is 255 squarings at runtime).
    a and result in Montgomery form."""
    if e == 0:
        return one_mont(jnp.shape(a[0]))
    if e < 0:
        return pow_const(inv_mod(a), -e)
    nbits = e.bit_length()
    nmuls = nbits - 1 + bin(e).count("1")
    if nmuls <= _POW_UNROLL_LIMIT:
        acc = None
        for bit in bin(e)[2:]:
            if acc is not None:
                acc = mont_sqr(acc)
            if bit == "1":
                acc = a if acc is None else mont_mul(acc, a)
        return acc
    # LSB-first scan: acc *= base when bit set; base squares each step.
    bits = jnp.array([(e >> i) & 1 for i in range(nbits)], jnp.uint32)
    shape = jnp.shape(a[0])
    a_b = [jnp.broadcast_to(x, shape) for x in a]

    def body(carry, bit):
        acc, base = carry
        take = bit != 0
        acc = select(take, mont_mul(acc, base), acc)
        base = mont_sqr(base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(
        body, (one_mont(shape), a_b), bits)
    return acc


def inv_mod(a):
    """Batched modular inverse via Fermat: a^(p-2). Fully data-parallel
    (unlike Montgomery's sequential trick), so it vectorizes over arbitrarily
    large batches — the TPU-native replacement for per-element NTL ``inv``.
    inv(0) = 0 by convention (callers mask)."""
    return pow_const(a, P - 2)


# Tonelli-Shanks static data: p - 1 = q * 2^s with s = 32; nonresidue z = 5.
_TS_S = 32
_TS_Q = (P - 1) >> _TS_S
_TS_ZQ = pow(5, _TS_Q, P)  # z^q precomputed on host


def sqrt_mod(a):
    """Batched Tonelli-Shanks square root (constant-structure variant, cf.
    RFC 9380 G.4) with lax loops so the HLO stays small. Returns
    (root, has_root_mask); root*root == a wherever has_root_mask."""
    from .limbs import int_to_limbs
    shape = jnp.shape(a[0])
    one = [jnp.broadcast_to(x, shape) for x in one_mont(shape)]
    t = pow_const(a, _TS_Q)
    r = pow_const(a, (_TS_Q + 1) // 2)
    c = to_mont(const_list(int_to_limbs(_TS_ZQ), shape))

    def stack(lst):
        return jnp.stack(lst, 0)

    def unstack(arr):
        return [arr[j] for j in range(L)]

    def outer(idx, state):
        r_s, t_s, c_s = state
        r_l, t_l, c_l = unstack(r_s), unstack(t_s), unstack(c_s)
        i = _TS_S - idx  # i runs s, s-1, ..., 2
        b = jax.lax.fori_loop(
            0, i - 2, lambda _, bb: stack(mont_sqr(unstack(bb))), t_s)
        need = ~eq_mask(unstack(b), one)
        c2 = mont_sqr(c_l)
        r_l = select(need, mont_mul(r_l, c_l), r_l)
        t_l = select(need, mont_mul(t_l, c2), t_l)
        return stack(r_l), stack(t_l), stack(c2)

    r_s, _, _ = jax.lax.fori_loop(
        0, _TS_S - 1, outer, (stack(r), stack(t), stack(c)))
    r = unstack(r_s)
    has_root = eq_mask(mont_sqr(r), a) | is_zero_mask(a)
    return r, has_root
