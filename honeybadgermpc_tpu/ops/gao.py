"""Gao Reed-Solomon error-correcting decode, batched under jit.

TPU redesign of the reference's NTL Gao decoder (rsdecode_impl.h:
`partial_gcd` :281-323, `gao_interpolate` :325-363, `gao_interpolate_fft`
:365-402 and the GaoRobustDecoder wrapper reed_solomon.py:151-186).

The reference's EEA has data-dependent degrees and loop bounds, which is
incompatible with XLA's static-shape model. Here every polynomial lives in a
fixed-size coefficient buffer [m+1] with a traced degree scalar per batch
instance, and the EEA runs as a fixed-trip ``lax.fori_loop`` of masked,
**division-free** elimination steps (cross-multiplying by leading
coefficients instead of dividing — valid because (g, v) are only needed up
to a common scalar, which cancels in f = g / v):

    r0' = lc(r1) * r0 - lc(r0) * X^(d0-d1) * r1      (deg drops by >= 1)

Each step touches whole [batch, m+1] limb tensors, so the batch axis (and
the limb axis) stay fully vectorized; only the ~2m elimination steps are
sequential. Error positions come out as the roots of the error-locator v
among the evaluation points, matching GaoRobustDecoder's error reporting
(reed_solomon.py:174-185).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import montgomery as mont
from .fparray import FpArray
from .limbs import L, P, R_MOD_P, ints_to_limbs
from .rs import Encoding


def _poly_degree(limbs):
    """Highest nonzero coefficient index (or -1): limbs [L, ..., M]."""
    nz = ~(mont.is_zero_mask(limbs))             # [..., M] bool
    m = limbs.shape[-1]
    ar = jnp.arange(m, dtype=jnp.int32)
    return jnp.max(jnp.where(nz, ar, -1), axis=-1)


def _gather_coeff(limbs, idx):
    """limbs[L, ..., M] at per-batch coefficient index idx[...] (clipped).

    One-hot masked reduction instead of take_along_axis: per-element
    gathers on the minor (lane) axis scalarize on TPU (measured ~500 ms
    per EEA step at M=5); the select+sum lowers to pure VPU ops."""
    m = limbs.shape[-1]
    ar = jnp.arange(m, dtype=jnp.int32)
    hot = ar == jnp.clip(idx, 0)[..., None]      # [..., M]
    picked = jnp.where(hot[None, ...], limbs, jnp.zeros_like(limbs))
    return jnp.sum(picked, axis=-1, dtype=limbs.dtype)


def _shift_poly(limbs, s):
    """Multiply by X^s (per-batch traced shift): out[i] = in[i-s].

    Log-decomposition of the shift: compose static pad-shifts of 1,2,4,..
    selected by the bits of s — all lane-aligned slices and selects, no
    dynamic gather (see _gather_coeff)."""
    m = limbs.shape[-1]
    out = limbs
    pad_cfg = [(0, 0)] * (limbs.ndim - 1)
    for b in range(max(1, (m - 1).bit_length())):
        sh = 1 << b
        if sh >= m:
            shifted = jnp.zeros_like(out)
        else:
            shifted = jnp.pad(out[..., :-sh], pad_cfg + [(sh, 0)])
        bit = ((s >> b) & 1).astype(bool)        # [...]
        out = jnp.where(bit[None, ..., None], shifted, out)
    return out


def _one_hot_mul(value_limbs, idx, m):
    """Polynomial value * X^idx as a dense [L, ..., m] tensor."""
    ar = jnp.arange(m, dtype=jnp.int32)
    hot = ar == idx[..., None]                   # [..., m]
    v = jnp.broadcast_to(value_limbs[..., None], value_limbs.shape + (m,))
    return jnp.where(hot[None, ...], v, jnp.zeros_like(v))


@lru_cache(maxsize=None)
def _g0_coeffs(xs: tuple):
    """A(X) = prod (X - x_i) as Montgomery limbs [L, m+1] (host exact)."""
    a = [1]
    for x in xs:
        nxt = [0] * (len(a) + 1)
        for i, c in enumerate(a):
            nxt[i] = (nxt[i] - c * x) % P
            nxt[i + 1] = (nxt[i + 1] + c) % P
        a = nxt
    return ints_to_limbs(np.asarray([c * R_MOD_P % P for c in a], dtype=object))


def gao_robust_decode(enc: Encoding, zs, ys: FpArray, k: int):
    """Decode degree<k message from shares ys[..., m] of parties zs, with up
    to (m-k)//2 wrong shares. Returns (coeffs[..., k], error_mask[..., m],
    ok[...]): error_mask marks provided shares that disagree with the decoded
    codeword; ok=False where more than (m-k)//2 errors made decoding fail.
    The EEA kernel compiles per SHAPE (m, k); the x-set tables (A(X), the
    re-encode Vandermonde) are host-cached device arguments, so a new
    erasure subset costs no recompile."""
    zs = tuple(int(z) for z in zs)
    assert ys.shape[-1] == len(zs) and k <= len(zs)
    xs = tuple(enc.points[z] for z in zs)
    g1 = enc.decode(zs, ys)                                # [..., m]
    return _gao_from_g1(xs, k, g1)


def gao_decode_points(xs, ys: FpArray, k: int):
    """gao_robust_decode over ARBITRARY evaluation points xs (no Encoding
    domain) — the pyx gao_interpolate:389 entry, where callers pass raw x
    coordinates. Same returns as gao_robust_decode."""
    from .fpmatmul import vandermonde_batch_interpolate
    xs = tuple(int(x) % P for x in xs)
    assert ys.shape[-1] == len(xs) and k <= len(xs)
    g1 = vandermonde_batch_interpolate(xs, ys)             # [..., m]
    return _gao_from_g1(xs, k, g1)


def _gao_from_g1(xs: tuple, k: int, g1: FpArray):
    from .devcache import dev_const
    m = len(xs)
    g0 = dev_const(_g0_coeffs(xs))                         # [L, m+1]
    vand = dev_const(_gao_vand_np(xs, m + 1))              # [L, m+1, m]
    return _gao_kernel(m, k)(g1.limbs, g0, vand)


@lru_cache(maxsize=None)
def _gao_vand_np(xs: tuple, rows: int):
    """Re-encode matrix V[i][j] = xs[j]^i (Montgomery numpy, host-cached)."""
    v = np.asarray([[pow(x, i, P) * R_MOD_P % P for x in xs]
                    for i in range(rows)], dtype=object)
    return ints_to_limbs(v)


@lru_cache(maxsize=None)
def _gao_kernel(m: int, k: int):
    """EEA decode kernel, compiled per (m, k) SHAPE only — the x-set enters
    via the g0 / vand device arguments (see gao_robust_decode)."""
    M = m + 1
    stop2 = m + k            # continue while 2*deg(r1) >= m+k
    n_eea = 2 * m            # each step drops max(d0,d1) by >= 1

    @jax.jit
    def kernel(g1_limbs, g0, vand):
        batch = g1_limbs.shape[1:-1]
        pad = jnp.zeros((L,) + batch + (M - m,), jnp.uint32)
        r1 = jnp.concatenate([g1_limbs, pad], -1)          # [L, ..., M]
        r0 = jnp.broadcast_to(
            g0.reshape((L,) + (1,) * len(batch) + (M,)), r1.shape)
        one = mont.one_mont(batch + (1,))
        zpoly = jnp.zeros_like(r1)
        v0 = zpoly
        v1 = jnp.concatenate([one, jnp.zeros((L,) + batch + (M - 1,), jnp.uint32)], -1)
        d0 = jnp.full(batch, m, jnp.int32)
        d1 = _poly_degree(r1)

        def eea_step(_, st):
            r0, r1, v0, v1, d0, d1 = st
            active = (2 * d1 >= stop2) & (d1 >= 0)
            lc0 = _gather_coeff(r0, d0)                    # [L, ...]
            lc1 = _gather_coeff(r1, d1)
            sh = jnp.clip(d0 - d1, 0)
            r1s = _shift_poly(r1, sh)
            v1s = _shift_poly(v1, sh)
            r0n = mont.sub_mod(mont.mont_mul(lc1[..., None], r0),
                               mont.mont_mul(lc0[..., None], r1s))
            v0n = mont.sub_mod(mont.mont_mul(lc1[..., None], v0),
                               mont.mont_mul(lc0[..., None], v1s))
            d0n = _poly_degree(r0n)
            swap = d0n < d1
            nr0 = mont.select((active & ~swap)[..., None], r0n, r0)
            nv0 = mont.select((active & ~swap)[..., None], v0n, v0)
            nd0 = jnp.where(active & ~swap, d0n, d0)
            nr0 = mont.select((active & swap)[..., None], r1, nr0)
            nv0 = mont.select((active & swap)[..., None], v1, nv0)
            nd0 = jnp.where(active & swap, d1, nd0)
            nr1 = mont.select((active & swap)[..., None], r0n, r1)
            nv1 = mont.select((active & swap)[..., None], v0n, v1)
            nd1 = jnp.where(active & swap, d0n, d1)
            return nr0, nr1, nv0, nv1, nd0, nd1

        r0, r1, v0, v1, d0, d1 = jax.lax.fori_loop(
            0, n_eea, eea_step, (r0, r1, v0, v1, d0, d1))
        # (g, v) = (r1, v1) — the first remainder with deg < (m+k)/2
        g, v, dv = r1, v1, _poly_degree(v1)

        # long division f = g / v, remainder rr
        lcv = _gather_coeff(v, dv)
        lcv_inv = mont.inv_mod(lcv)
        f = zpoly
        rr = g
        dr = _poly_degree(rr)

        def div_step(_, st):
            f, rr, dr = st
            active = dr >= dv
            q = mont.mont_mul(_gather_coeff(rr, dr), lcv_inv)  # [L, ...]
            qpos = jnp.clip(dr - dv, 0)
            f_n = mont.add_mod(f, _one_hot_mul(q, qpos, M))
            sub = mont.mont_mul(q[..., None], _shift_poly(v, qpos))
            rr_n = mont.sub_mod(rr, sub)
            f = mont.select(active[..., None], f_n, f)
            rr = mont.select(active[..., None], rr_n, rr)
            dr = jnp.where(active, _poly_degree(rr_n), dr)
            return f, rr, dr

        f, rr, dr = jax.lax.fori_loop(0, M, div_step, (f, rr, dr))

        ok = (dr < 0) & (_poly_degree(f) < k) & (dv >= 0)
        # error positions: shares disagreeing with re-encoded f
        from .fpmatmul import _matmul_kernel
        reenc = _matmul_kernel(f, vand)                    # [..., m]
        return f[..., :k], reenc, ok

    def wrapper(g1_limbs, g0, vand):
        f, reenc, ok = kernel(g1_limbs, g0, vand)
        return FpArray(f), FpArray(reenc), ok

    return wrapper


def gao_decode_with_errors(enc: Encoding, zs, ys: FpArray, k: int):
    """Convenience wrapper matching GaoRobustDecoder.robust_decode
    (reed_solomon.py:160-186): returns (coeffs, error_mask_over_zs, ok)."""
    f, reenc, ok = gao_robust_decode(enc, zs, ys, k)
    err = ~reenc.eq(ys)
    return f, err, ok
