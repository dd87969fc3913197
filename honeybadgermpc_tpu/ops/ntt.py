"""Batched radix-2 NTT over GF(p) — the TPU replacement for the reference's
NTL FFT core (honeybadgermpc/ntl/rsdecode_impl.h:125-192 `_fft`/`fft` and the
Cython batch wrappers hbmpc_ntl_helpers.pyx:266-385).

Design: the transform axis is the LAST axis; arbitrary leading axes are the
batch (the OpenMP ``prange`` of the reference becomes pure vectorization).
Twiddle factors are precomputed host-side per (omega, n) in Montgomery limb
form and baked into a cached jitted kernel, exactly mirroring the reference's
per-(xs) caching discipline (rsdecode_impl.h:18-20).

Stages are unrolled at trace time (log2(n) Montgomery multiplies in the HLO);
fine for the protocol-relevant orders (n <= 2^12). Interpolation-sized
transforms dominate the framework's hot path via ops/rs.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import montgomery as mont
from .fparray import FpArray
from .limbs import L, P, R_MOD_P, int_to_limbs


def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    perm = np.zeros(n, dtype=np.int32)
    for i in range(n):
        perm[i] = int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
    return perm


@lru_cache(maxsize=None)
def _twiddles(omega: int, n: int):
    """Per-stage Montgomery-form twiddle limb tables: stage s (m = 2^(s+1))
    needs omega^(j * n/m) for j < m/2."""
    stages = []
    for s in range(n.bit_length() - 1):
        m = 2 << s
        w = pow(omega, n // m, P)
        tw = np.empty((L, m // 2), dtype=np.uint32)
        acc = 1
        for j in range(m // 2):
            tw[:, j] = int_to_limbs(acc * R_MOD_P % P)
            acc = acc * w % P
        stages.append(tw)
    return tuple(stages)


@lru_cache(maxsize=None)
def _ntt_kernel(omega: int, n: int):
    """Jitted limbs[L, ..., n] -> limbs[L, ..., n] natural-order DIT NTT."""
    stages = _twiddles(omega, n)
    perm = _bitrev_perm(n)  # numpy: converted inside the traced body

    @jax.jit
    def kernel(limbs):
        x = jnp.take(limbs, jnp.asarray(perm), axis=-1)
        nb = x.ndim - 2  # batch dims between limb axis and transform axis
        for s, tw in enumerate(stages):
            m = 2 << s
            half = m // 2
            shp = x.shape[:-1] + (n // m, m)
            v = x.reshape(shp)
            lo, hi = v[..., :half], v[..., half:]
            twb = jnp.asarray(np.asarray(tw)).reshape(
                (L,) + (1,) * (nb + 1) + (half,))
            t = mont.mont_mul(jnp.broadcast_to(twb, hi.shape), hi)
            top = mont.add_mod(lo, t)
            bot = mont.sub_mod(lo, t)
            x = jnp.concatenate([top, bot], axis=-1).reshape(x.shape)
        return x

    return kernel


def ntt(x: FpArray, omega: int) -> FpArray:
    """Evaluate polynomials (coeffs on last axis, length n = power of 2) at
    omega^0..omega^(n-1). Reference semantics: rsdecode_impl.h fft:171."""
    n = x.shape[-1]
    assert n & (n - 1) == 0, "transform length must be a power of 2"
    assert pow(omega, n, P) == 1 and pow(omega, n // 2, P) != 1
    return FpArray(_ntt_kernel(omega % P, n)(x.limbs))


@lru_cache(maxsize=None)
def _n_inv_limbs(n: int):
    return tuple(int(v) for v in int_to_limbs(pow(n, P - 2, P) * R_MOD_P % P))


@partial(jax.jit, static_argnums=1)
def intt(y: FpArray, omega: int) -> FpArray:
    """Inverse transform: coefficients of the unique degree<n polynomial with
    p(omega^i) = y[..., i]. Jitted end-to-end (omega static) — eager op
    dispatch costs 15-200 ms on the remote-tunneled TPU backend."""
    n = y.shape[-1]
    omega_inv = pow(omega, P - 2, P)
    coeffs = ntt(y, omega_inv)
    n_inv = FpArray(
        jnp.asarray(np.array(_n_inv_limbs(n), dtype=np.uint32)).reshape(
            (L,) + (1,) * len(y.shape)))
    return coeffs * n_inv


@partial(jax.jit, static_argnums=(1, 2, 3))
def fft_evaluate(coeffs: FpArray, omega: int, n: int, k: int | None = None) -> FpArray:
    """Pad coeffs (last axis) to n, NTT, optionally truncate to first k
    outputs — mirrors the truncated-output fft of rsdecode_impl.h:171-192.
    Jitted end-to-end (omega/n/k static)."""
    pad = n - coeffs.shape[-1]
    assert pad >= 0
    if pad:
        zshape = coeffs.shape[:-1] + (pad,)
        coeffs = FpArray.concatenate(
            [coeffs, FpArray.zeros(zshape)], axis=coeffs.ndim - 1)
    out = ntt(coeffs, omega)
    if k is not None and k < n:
        out = FpArray(out.limbs[..., :k])
    return out


def partial_fft(coeffs: FpArray, omega: int, n: int, k: int) -> FpArray:
    """First k outputs of the n-point NTT (hbmpc_ntl_helpers.pyx:266)."""
    return fft_evaluate(coeffs, omega, n, k=k)


def fft_interpolate(ys: FpArray, omega: int) -> FpArray:
    """Coefficients through (omega^i, ys[..., i]) — hbmpc_ntl_helpers.pyx:318."""
    return intt(ys, omega)


@partial(jax.jit, static_argnums=1)
def interp_extrap(xs: FpArray, omega: int) -> FpArray:
    """Interpolate on even omega powers, evaluate at all 2n powers
    (reference polynomial.py:142-158 / pyx interp_extrap). xs last axis n.
    Jitted end-to-end (omega static)."""
    n = xs.shape[-1]
    coeffs = intt(xs, pow(omega, 2, P))
    return fft_evaluate(coeffs, omega, 2 * n)
