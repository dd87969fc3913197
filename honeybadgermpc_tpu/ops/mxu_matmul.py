"""GF(p) matrix multiply on the MXU (systolic array).

The VPU/Pallas matmul (ops/pallas_field.py) costs a full CIOS multiply per
(B, k, n) term. This path moves the multiply-accumulate onto the MXU:

 1. Operands decompose into 7-bit planes (37 planes cover 259 bits; values
    0..127 fit int8 exactly).
 2. The base-2^7 product convolution is ONE int8 matmul: A' [B, k*37]
    against a block-band matrix V' [k*37, n*73] with V'[(kk,i),(nn,l)] =
    V8[kk,nn,l-i] — output planes are the convolution diagonals, each
    < k*37*127^2 < 2^31 (int32-safe).
 3. A Pallas epilogue folds the 73 base-2^7 planes into carry-save 16-bit
    limbs and runs 20 Montgomery REDC rounds (dividing by 2^320). The
    extra 2^-64 is cancelled by pre-scaling V by 2^64, so the output is the
    standard Montgomery form of sum_k a*v. The 20-round variant keeps the
    pre-reduction value (< k*p^2 ~ 2^515) inside the single-cond-sub bound.

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
_P = [int(x) for x in P_LIMBS]

# 2^64 * R mod p as Montgomery multiplier constant (mont_mul(x, this) = x * 2^64)
_SCALE64 = int_to_limbs((1 << 64) * R_MOD_P % P)


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


def _build_vband(v_limbs):
    """v[L, k, n] Montgomery limbs -> V' int8[k*NPLANES, n*NOUT] with the
    2^64 pre-scale baked in."""
    from . import montgomery as mont
    k, n = v_limbs.shape[1], v_limbs.shape[2]
    scale = mont.const_stack(_SCALE64, (k, n))
    w = mont.mont_mul(v_limbs, scale)              # v * 2^64 (Montgomery)
    v8 = _planes7(w)                               # [k, n, NPLANES] int8
    band = jnp.zeros((k, NPLANES, n, NOUT), jnp.int8)
    for i in range(NPLANES):
        band = jax.lax.dynamic_update_slice(
            band, v8[:, None, :, :], (0, i, 0, i))
    return band.reshape(k * NPLANES, n * NOUT)


def _redc_kernel(d_ref, o_ref):
    """d_ref [NOUT, SUBS, LANES] int32 diagonals -> o_ref [L, SUBS, LANES]
    canonical Montgomery limbs. 20 REDC rounds divide by 2^320."""
    shape = d_ref.shape[1:]
    NL = 36  # carry-save limbs: 73 planes * 7 bits = 511 bits -> 32 limbs,
             # +2 slack for carry-save spill, +2 for m*p adds

    t = [jnp.zeros(shape, jnp.uint32) for _ in range(NL)]
    for l in range(NOUT):
        d = d_ref[l].astype(jnp.uint32)            # < 2^31
        bit = PLANE_BITS * l
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
    # carry-save limbs are < 2^21 (<= ~10 contributions of < 2^16 each
    # plus shifted-out pieces); REDC rounds below add m*P pieces < 2^17.

    for _ in range(20):
        m = ((t[0] & MASK) * jnp.uint32(N0)) & MASK
        for j in range(L):
            pr = m * jnp.uint32(_P[j])
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
    o_ref[...] = jnp.stack(
        [jnp.where(take, d2[j], out[j]) for j in range(L)], axis=0)


def _interpret():
    return jax.default_backend() in ("cpu",)


def fp_matmul_mxu(a_limbs, v_limbs):
    """a[L, B, k] @ v[L, k, n] (both Montgomery) -> [L, B, n] Montgomery.
    MXU path; see module docstring."""
    Lx, B, k = a_limbs.shape
    n = v_limbs.shape[2]
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
