"""Montgomery-form GF(p) arithmetic kernels in JAX (VPU path).

These are the building blocks everything else (NTT, Reed-Solomon,
reconstruction, MPC ops) lowers to. All functions operate on stacked
``uint32[L, *batch]`` limb arrays (16-bit limbs in uint32 lanes, leading limb
axis — see ops/limbs.py).

The multiplier is a **carry-save CIOS**: instead of rippling a carry through
an unrolled 16x16 scalar-limb double loop (which bloats the HLO to ~2k ops
per multiply and starves the VPU), each outer step does whole-limb-vector
ops — one 16-wide product, lo/hi split, two shifted adds — and keeps the
accumulator in redundant form (limbs < 2^23), with a single carry
normalization at the end. ~300 HLO ops per multiply, fully vectorized over
limbs x batch. Overflow analysis in comments below.

Reference semantics: honeybadgermpc/field.py:68-233 (GFElement algebra) and
honeybadgermpc/ntl/rsdecode_impl.h (the NTL ZZ_p compute core). This is a
ground-up redesign for TPU, not a port.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import (L, MASK, N0, P, P_LIMBS, R2_MOD_P_LIMBS, R_MOD_P_LIMBS,
                    W, int_to_limbs)

_U32 = jnp.uint32
_P_STACK = np.asarray(P_LIMBS).reshape((L,) + ())  # uint32[L]


def _bshape(a):
    return a.shape[1:]


def _pstack(shape):
    return jnp.asarray(P_LIMBS, _U32).reshape((L,) + (1,) * len(shape))


def _align2(a, b):
    """numpy broadcasting aligns trailing dims, which is wrong for the
    limb-LEADING layout when element ranks differ ([L,k] vs [L,B,k] must
    align as [L,1,k]). Insert singleton batch dims right after the limb
    axis so element shapes broadcast by their own trailing-dim rules."""
    s1, s2 = a.shape[1:], b.shape[1:]
    s = jnp.broadcast_shapes(s1, s2)
    if len(s1) < len(s):
        a = a.reshape((L,) + (1,) * (len(s) - len(s1)) + tuple(s1))
    if len(s2) < len(s):
        b = b.reshape((L,) + (1,) * (len(s) - len(s2)) + tuple(s2))
    return a, b


def _shift_up(x, rows=1):
    """Multiply by 2^(16*rows) in limb space: prepend zero limbs, drop top."""
    pad = jnp.zeros((rows,) + x.shape[1:], _U32)
    return jnp.concatenate([pad, x[:-rows]], axis=0)


# -- canonical (limbs < 2^16) add/sub with ripple chains ---------------------

def _carry_chain(vals):
    """Normalize a list of L limb arrays (< 2^32) into canonical limbs plus
    carry-out. Sequential 16-step ripple on [...]-shaped arrays."""
    c = jnp.zeros(vals[0].shape, _U32)
    out = []
    for j in range(L):
        v = vals[j] + c
        out.append(v & MASK)
        c = v >> W
    return out, c


def _unstack(a):
    return [a[j] for j in range(L)]


def add_mod(a, b):
    a, b = _align2(a, b)
    s = a + b                       # limbs < 2^17
    out, carry = _carry_chain(_unstack(s))
    return cond_sub_p(jnp.stack(out, 0), carry)


def _sub_p_list(a_list, shape):
    borrow = jnp.zeros(shape, _U32)
    out = []
    for j in range(L):
        t = a_list[j] - _U32(int(P_LIMBS[j])) - borrow
        out.append(t & MASK)
        borrow = (t >> W) & _U32(1)
    return out, borrow


def cond_sub_p(a, hi):
    """Reduce a (value hi*2^256 + a < 2p) into [0, p). a canonical limbs."""
    d, borrow = _sub_p_list(_unstack(a), _bshape(a))
    take = (hi != 0) | (borrow == 0)
    return jnp.where(take, jnp.stack(d, 0), a)


def sub_mod(a, b):
    a, b = _align2(a, b)
    al, bl = _unstack(a), _unstack(b)
    borrow = jnp.zeros(jnp.broadcast_shapes(_bshape(a), _bshape(b)), _U32)
    d = []
    for j in range(L):
        t = al[j] - bl[j] - borrow
        d.append(t & MASK)
        borrow = (t >> W) & _U32(1)
    # if borrow: add p back
    carry = jnp.zeros_like(borrow)
    dp = []
    for j in range(L):
        t = d[j] + _U32(int(P_LIMBS[j])) + carry
        dp.append(t & MASK)
        carry = t >> W
    neg = borrow != 0
    return jnp.where(neg, jnp.stack(dp, 0), jnp.stack(d, 0))


def neg_mod(a):
    """p - a (a < p, so no borrow escapes), with -0 = 0."""
    zero = is_zero_mask(a)
    borrow = jnp.zeros(_bshape(a), _U32)
    d = []
    for j in range(L):
        t = _U32(int(P_LIMBS[j])) - a[j] - borrow
        d.append(t & MASK)
        borrow = (t >> W) & _U32(1)
    out = jnp.stack(d, 0)
    return jnp.where(zero, jnp.zeros_like(out), out)


def is_zero_mask(a):
    return _or_fold(a) == 0


def _or_fold(a):
    acc = a[0]
    for j in range(1, L):
        acc = acc | a[j]
    return acc


def eq_mask(a, b):
    a, b = _align2(a, b)
    return _or_fold(a ^ b) == 0


# -- carry-save CIOS multiplier ----------------------------------------------

import os as _os


def _use_pallas(numel: int) -> bool:
    """Dispatch the register-resident Pallas kernel on real TPU backends.
    The jnp path remains for CPU tests and tiny shapes (grid padding would
    dominate below ~1 tile)."""
    if _os.environ.get("HBMPC_DISABLE_PALLAS"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend not in ("cpu",) and numel >= 1024


def mont_mul(a, b):
    """a*b*R^{-1} mod p, canonical output (< p). a, b: canonical uint32[L,...].

    Redundant accumulator t: uint32[L+1, ...], limbs < 2^23.
    Per outer step i, limb j gains at most lo_j + hi_{j-1} + mlo_j + mhi_{j-1}
    <= 4*(2^16-1); the limb-0 carry re-injection adds < 2^16. Over 16 steps
    every limb stays < 16*4*2^16 + 2^16 < 2^23 << 2^32, so uint32 never
    overflows. m is derived from t[0] mod 2^16 which is exact in carry-save
    form (higher-order contributions never wrap downward).
    """
    a, b = _align2(a, b)
    shape = jnp.broadcast_shapes(_bshape(a), _bshape(b))
    numel = 1
    for d in shape:
        numel *= d
    if _use_pallas(numel):
        from .pallas_field import mont_mul_pallas
        return mont_mul_pallas(jnp.broadcast_to(a, (L,) + shape),
                               jnp.broadcast_to(b, (L,) + shape))
    b = jnp.broadcast_to(b, (L,) + shape)
    pst = jnp.broadcast_to(_pstack(shape), (L,) + shape)
    zrow = jnp.zeros((1,) + shape, _U32)
    t = jnp.zeros((L + 1,) + shape, _U32)
    for i in range(L):
        ai = a[i]
        prod = ai[None, ...] * b                    # [L, ...] < 2^32
        lo, hi = prod & MASK, prod >> W
        t = t + jnp.concatenate([lo, zrow], 0) \
              + jnp.concatenate([zrow, hi], 0)
        m = ((t[0] & MASK) * _U32(N0)) & MASK       # [...]
        mprod = m[None, ...] * pst                  # [L, ...] < 2^32
        mlo, mhi = mprod & MASK, mprod >> W
        t = t + jnp.concatenate([mlo, zrow], 0) \
              + jnp.concatenate([zrow, mhi], 0)
        carry0 = t[0] >> W                          # t[0] ≡ 0 mod 2^16 now
        t = jnp.concatenate([t[1:], zrow], 0)
        t = t.at[0].add(carry0)
    # normalize: value < 2p < 2^256 so carry out of limb 15 plus t[L] is 0
    out, _ = _carry_chain(_unstack(t))
    return cond_sub_p(jnp.stack(out, 0), jnp.zeros(shape, _U32))


def mont_sqr(a):
    return mont_mul(a, a)


RAND_LIMBS = 24        # 384-bit draws: distance to uniform mod p < 2^-129


def redc384(t_limbs):
    """Canonical limbs (< p) of T * 2^-144 mod p from a 384-bit value
    T given as uint32[24, ...] 16-bit limbs (little-endian).

    This is the reduction half of the CIOS multiplier run standalone: nine
    rounds of (m = -t/p mod 2^16; t += m*p; t >>= 16). Nine rounds leave
    value < 2^(384-144) + p < 2p, so one conditional subtract
    canonicalizes. Used by FpArray.rand: multiplication by the constant
    2^-144 is a bijection on Z_p, so T uniform on [0, 2^384) gives an
    output within p/2^384 < 2^-129 of uniform — unlike reducing a 256-bit
    draw, where 2^256 ~ 2.21p makes some residues 3-covered and others
    2-covered (statistical distance ~7.5%%)."""
    assert t_limbs.shape[0] == RAND_LIMBS, t_limbs.shape
    shape = t_limbs.shape[1:]
    rows = [t_limbs[j] for j in range(RAND_LIMBS)] \
        + [jnp.zeros(shape, _U32)]
    rounds = 9
    for _ in range(rounds):
        m = ((rows[0] & MASK) * _U32(N0)) & MASK
        for j in range(L):
            mp = m * _U32(int(P_LIMBS[j]))          # < 2^32
            rows[j] = rows[j] + (mp & MASK)
            rows[j + 1] = rows[j + 1] + (mp >> W)
        carry0 = rows[0] >> W                       # rows[0] ≡ 0 mod 2^16
        rows = rows[1:]
        rows[0] = rows[0] + carry0
    # carry-save overflow: each round adds <= 3 limb-size terms per row,
    # so rows stay < 2^21 << 2^32; 25-9 = 16 rows remain, value < 2p
    out, carry = _carry_chain(rows)
    return cond_sub_p(jnp.stack(out, 0), carry)


def const_stack(limbs_np, shape=()):
    """Compile-time uint32[L] numpy limbs -> broadcast [L, *shape] array."""
    return jnp.broadcast_to(
        jnp.asarray(np.asarray(limbs_np, np.uint32)).reshape(
            (L,) + (1,) * len(shape)), (L,) + tuple(shape))


def to_mont(a):
    """Plain residue (any 256-bit value) -> Montgomery form of (a mod p)."""
    return mont_mul(a, const_stack(R2_MOD_P_LIMBS, _bshape(a)))


def from_mont(a):
    """Montgomery form -> plain residue in [0, p)."""
    one = const_stack(int_to_limbs(1), _bshape(a))
    return mont_mul(a, one)


def one_mont(shape=()):
    return const_stack(R_MOD_P_LIMBS, shape)


def select(mask, a, b):
    """where(mask, a, b) on stacked limbs; mask has batch shape."""
    return jnp.where(mask[None, ...], a, b)


_POW_UNROLL_LIMIT = 18


def pow_const(a, e: int):
    """a**e for a compile-time int exponent. Small e unrolls; large e lowers
    to a lax.scan over bits (one squaring + one multiply in the HLO)."""
    if e == 0:
        return one_mont(_bshape(a))
    if e < 0:
        return pow_const(inv_mod(a), -e)
    nbits = e.bit_length()
    if nbits - 1 + bin(e).count("1") <= _POW_UNROLL_LIMIT:
        acc = None
        for bit in bin(e)[2:]:
            if acc is not None:
                acc = mont_sqr(acc)
            if bit == "1":
                acc = a if acc is None else mont_mul(acc, a)
        return acc
    bits = jnp.array([(e >> i) & 1 for i in range(nbits)], _U32)

    def body(carry, bit):
        acc, base = carry
        acc = select(jnp.broadcast_to(bit != 0, _bshape(acc)), mont_mul(acc, base), acc)
        base = mont_sqr(base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (one_mont(_bshape(a)), a), bits)
    return acc


def inv_mod(a):
    """Batched modular inverse via Fermat: a^(p-2); inv(0)=0 (callers mask).
    Fully data-parallel — the TPU replacement for per-element NTL inv."""
    return pow_const(a, P - 2)


# Tonelli-Shanks static data: p - 1 = q * 2^s with s = 32; nonresidue z = 5.
_TS_S = 32
_TS_Q = (P - 1) >> _TS_S
_TS_ZQ = pow(5, _TS_Q, P)


def sqrt_mod(a):
    """Batched constant-structure Tonelli-Shanks (cf. RFC 9380 G.4) with lax
    loops. Returns (root, has_root_mask); root*root == a where mask set."""
    shape = _bshape(a)
    one = one_mont(shape)
    t = pow_const(a, _TS_Q)
    r = pow_const(a, (_TS_Q + 1) // 2)
    c = to_mont(const_stack(int_to_limbs(_TS_ZQ), shape))

    def outer(idx, state):
        r_, t_, c_ = state
        i = _TS_S - idx  # i runs s, s-1, ..., 2
        b = jax.lax.fori_loop(0, i - 2, lambda _, bb: mont_sqr(bb), t_)
        need = ~eq_mask(b, one)
        c2 = mont_sqr(c_)
        r_ = select(need, mont_mul(r_, c_), r_)
        t_ = select(need, mont_mul(t_, c2), t_)
        return r_, t_, c2

    r, _, _ = jax.lax.fori_loop(0, _TS_S - 1, outer, (r, t, c))
    has_root = eq_mask(mont_sqr(r), a) | is_zero_mask(a)
    return r, has_root
