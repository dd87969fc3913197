"""Modular matrix products over GF(p): Vandermonde evaluate / interpolate.

TPU replacement for the reference's NTL Vandermonde kernels
(hbmpc_ntl_helpers.pyx:115-244 `vandermonde_inverse`,
`vandermonde_batch_evaluate`, `vandermonde_batch_interpolate`; NTL
`mat_ZZ_p_mul`). The Vandermonde matrices depend only on the x-set, so they
are computed once host-side with exact Python ints (mirroring the
reference's amortization) and baked as Montgomery limb constants into a
cached jitted kernel.

The inner product runs as a lax.scan of fused Montgomery multiply-adds over
the contraction axis — one multiply in the HLO regardless of k. (A future
MXU path will lower this to int8 limb-plane matmuls with lazy reduction;
the call signatures here are stable against that swap.)
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import montgomery as mont
from .fparray import FpArray
from .limbs import L, P, R_MOD_P, ints_to_limbs


def _mont_np(values) -> np.ndarray:
    """Host ints -> Montgomery-form uint32[L, *shape]."""
    arr = np.asarray(
        [[v * R_MOD_P % P for v in row] for row in values], dtype=object)
    return ints_to_limbs(arr)


@jax.jit
def _matmul_kernel(a_limbs, m_limbs):
    """a[L, ..., k] @ m[L, k, n] -> [L, ..., n] over GF(p), Montgomery form.

    scan over the contraction axis: acc += a[..., i] * m[i, :].
    """
    k = a_limbs.shape[-1]
    n = m_limbs.shape[-1]
    batch_shape = a_limbs.shape[1:-1]
    # scan elements: (a column [L, ...], m row [L, n])
    a_t = jnp.moveaxis(a_limbs, -1, 0)          # [k, L, ...]
    m_t = jnp.moveaxis(m_limbs, 1, 0)           # [k, L, n]
    acc0 = jnp.zeros((L,) + batch_shape + (n,), jnp.uint32)

    def body(acc, inp):
        a_i, m_i = inp                               # [L, ...], [L, n]
        col = a_i[..., None]                         # [L, ..., 1]
        row = m_i.reshape((L,) + (1,) * len(batch_shape) + (n,))
        prod = mont.mont_mul(col, row)               # [L, ..., n]
        return mont.add_mod(acc, prod), None

    acc, _ = jax.lax.scan(body, acc0, (a_t, m_t))
    return acc


def fp_matmul(a: FpArray, m: FpArray) -> FpArray:
    """a[..., k] @ m[k, n] -> [..., n] over GF(p). On TPU the whole
    contraction runs inside one Pallas kernel (register-resident CIOS with
    modular accumulation); the lax.scan path serves CPU tests."""
    assert m.ndim == 2 and a.shape[-1] == m.shape[0], (a.shape, m.shape)
    from .montgomery import _use_pallas
    batch_shape = a.shape[:-1]
    numel = 1
    for d in batch_shape:
        numel *= d
    if _use_pallas(numel * m.shape[1]):
        from .limbs import L as _L
        k = a.shape[-1]
        flat = a.limbs.reshape(_L, numel, k)
        import os as _os
        if (numel >= 1024 and k * 37 * 127 * 127 < 2 ** 31
                and m.shape[1] >= 4
                and not _os.environ.get("HBMPC_MXU_V1")):
            # folded-constant MXU path: int8 plane matmul against a
            # mod-p-pre-reduced band, 1-2 REDC-round epilogue
            from .mxu_matmul import fp_matmul_mxu2, fused2_fits
            if fused2_fits(k, m.shape[1]):
                out = fp_matmul_mxu2(flat, m.limbs)
            else:
                from .mxu_matmul import fp_matmul_mxu
                out = fp_matmul_mxu(flat, m.limbs)
        elif numel >= 1024 and k * 37 * 127 * 127 < 2 ** 31:
            # MXU v1 path: full product convolution + 17-round REDC
            from .mxu_matmul import fp_matmul_mxu
            out = fp_matmul_mxu(flat, m.limbs)
        else:
            from .pallas_field import fp_matmul_pallas
            out = fp_matmul_pallas(flat, m.limbs)
        return FpArray(out.reshape((_L,) + batch_shape + (m.shape[1],)))
    return FpArray(_matmul_kernel(a.limbs, m.limbs))


@lru_cache(maxsize=None)
def _vandermonde_int_rows(xs: tuple, k: int):
    """Plain-int V[k][n], V[i][j] = xs[j]^i."""
    rows = []
    acc = [1] * len(xs)
    for _ in range(k):
        rows.append(list(acc))
        acc = [a * x % P for a, x in zip(acc, xs)]
    return tuple(tuple(r) for r in rows)


@lru_cache(maxsize=None)
def _vandermonde_np(xs: tuple, k: int):
    return _mont_np([list(r) for r in _vandermonde_int_rows(xs, k)])


def _numel(shape):
    out = 1
    for d in shape:
        out *= d
    return out


def _band_path_ok(k: int, m: int, batch: int) -> bool:
    """Host-constant folded-band MXU path: big batches on TPU only."""
    import os

    import jax

    from .band_matmul import band_fits
    return (jax.default_backend() not in ("cpu",) and batch >= 1024
            and band_fits(k, m)
            and not os.environ.get("HBMPC_NO_BAND_MATMUL"))


def vandermonde_matrix(xs: tuple, k: int) -> FpArray:
    """V[k, n] with V[i, j] = xs[j]^i (host-exact, Montgomery constants).
    NOTE: caches live as numpy so a first call inside a jit trace can't
    leak a tracer into the cache; eager calls reuse a device copy."""
    from .devcache import dev_const
    return FpArray(dev_const(_vandermonde_np(xs, k)))


@lru_cache(maxsize=None)
def _lagrange_int_rows(xs: tuple):
    """Host-exact int rows of W[k, k] such that coeffs = ys @ W interpolates
    through (xs, ys): W[j, i] = coefficient of X^i in the Lagrange basis
    poly L_j(X) (pyx vandermonde_inverse:115 semantics)."""
    k = len(xs)
    # master poly A(X) = prod (X - x_j)
    a = [1]
    for x in xs:
        nxt = [0] * (len(a) + 1)
        for i, c in enumerate(a):
            nxt[i] = (nxt[i] - c * x) % P
            nxt[i + 1] = (nxt[i + 1] + c) % P
        a = nxt
    rows = []
    for j, xj in enumerate(xs):
        # N_j(X) = A(X) / (X - xj) by synthetic division
        nj = [0] * k
        carry = a[k]
        for i in range(k - 1, -1, -1):
            nj[i] = carry
            carry = (a[i] + carry * xj) % P
        denom = 1
        for m_, xm in enumerate(xs):
            if m_ != j:
                denom = denom * (xj - xm) % P
        dinv = pow(denom, P - 2, P)
        rows.append([c * dinv % P for c in nj])
    return rows


def _lagrange_matrix_np(xs: tuple):
    return _mont_np(_lagrange_int_rows(xs))


def _lam_int(xs: tuple, x0: int):
    """lambda_j(x0): Lagrange basis of nodes xs evaluated at x0 (ints)."""
    out = []
    for j, xj in enumerate(xs):
        num, den = 1, 1
        for m_, xm in enumerate(xs):
            if m_ != j:
                num = num * (x0 - xm) % P
                den = den * (xj - xm) % P
        out.append(num * pow(den, P - 2, P) % P)
    return out


@lru_cache(maxsize=None)
def _decode_validate_np(points: tuple, k: int, want_coeffs: bool):
    """Fused decode + validate matrix for the optimistic open path.

    Shares from the FIRST k parties (nodes points[:k]) are interpolated and
    simultaneously re-evaluated at the REMAINING points[k:] in one matmul —
    the reference's decode + re-encode validation (reed_solomon.py:305-332)
    collapsed into a single constant matrix:

      want_coeffs: W[k, n]        = [Minv | lambda(points[k:])]
                   out[..., :k]   = polynomial coefficients
                   out[..., k:]   = predicted shares of the other parties
      else:        W[k, 1+(n-k)]  = [lambda(0) | lambda(points[k:])]
                   out[..., 0]    = interpolant at 0
                   out[..., 1:]   = predicted shares of the other parties
    """
    xs = tuple(points[:k])
    cols = []
    if want_coeffs:
        rows = _lagrange_int_rows(xs)
        cols = [[rows[j][i] for j in range(k)] for i in range(k)]
    else:
        cols = [_lam_int(xs, 0)]
    for x in points[k:]:
        cols.append(_lam_int(xs, int(x) % P))
    rows = [[col[j] for col in cols] for j in range(k)]
    return _mont_np(rows)


def decode_validate_matmul(points, k: int, ys: FpArray,
                           want_coeffs: bool) -> FpArray:
    """ys[..., k] (shares of parties 0..k-1) -> fused decode+validate
    output (see _decode_validate_np). One dispatch per call; compile
    cached per SHAPE (the points matrix is a device argument)."""
    from .devcache import dev_const
    w = FpArray(dev_const(_decode_validate_np(
        tuple(int(x) % P for x in points), k, want_coeffs)))
    return _fp_matmul_jit(ys, w)


def lagrange_matrix(xs: tuple) -> FpArray:
    from .devcache import dev_const
    return FpArray(dev_const(_lagrange_matrix_np(xs)))


# ONE jitted matmul program per SHAPE: the x-set enters as a device-array
# argument (host-cached per x-set), never as a static jit key — per-x-set
# keys compile a fresh multi-second program for every evaluation-point
# subset (arrival-order decoding generates many).
_fp_matmul_jit = jax.jit(fp_matmul)


@partial(jax.jit, static_argnums=0)
def _band_evaluate_jit(xs_t: tuple, coeffs: FpArray) -> FpArray:
    """Folded-constant MXU band path — deliberately x-set-keyed: the band
    folds the pre-reduced matrix into the kernel as int8 constants (the
    production hot path uses ONE x-set: the n party points)."""
    from .band_matmul import band_matmul_limbs
    k = coeffs.shape[-1]
    batch = _numel(coeffs.shape[:-1])
    flat = coeffs.limbs.reshape(coeffs.limbs.shape[0], batch, k)
    out = band_matmul_limbs(flat, _vandermonde_int_rows(xs_t, k))
    return FpArray(out.reshape(
        out.shape[:1] + coeffs.shape[:-1] + (len(xs_t),)))


def vandermonde_batch_evaluate(xs, coeffs: FpArray,
                               allow_band: bool = True) -> FpArray:
    """Evaluate polynomials (coeffs[..., k], k = degree+1) at points xs.
    Matches hbmpc_ntl_helpers.pyx:199 vandermonde_batch_evaluate.
    One dispatch per call; compile cached per SHAPE (see _fp_matmul_jit).
    ``allow_band=False`` forces the shape-keyed matmul path — required by
    callers whose x-set VARIES per call (erasure subsets), since the band
    kernel is deliberately x-set-keyed and would recompile per subset."""
    xs_t = tuple(int(x) % P for x in xs)
    k = coeffs.shape[-1]
    if allow_band and _band_path_ok(k, len(xs_t), _numel(coeffs.shape[:-1])):
        return _band_evaluate_jit(xs_t, coeffs)
    return _fp_matmul_jit(coeffs, vandermonde_matrix(xs_t, k))


def vandermonde_batch_interpolate(xs, ys: FpArray,
                                  allow_band: bool = True) -> FpArray:
    """Coefficients (degree < len(xs)) through (xs[i], ys[..., i]).
    Matches hbmpc_ntl_helpers.pyx:139 vandermonde_batch_interpolate.
    One dispatch per call; compile cached per SHAPE. ``allow_band=False``:
    see vandermonde_batch_evaluate."""
    xs_t = tuple(int(x) % P for x in xs)
    k = len(xs_t)
    assert ys.shape[-1] == k
    if allow_band and _band_path_ok(k, k, _numel(ys.shape[:-1])):
        return _band_interpolate_jit(xs_t, ys)
    return _fp_matmul_jit(ys, lagrange_matrix(xs_t))


@partial(jax.jit, static_argnums=0)
def _band_interpolate_jit(xs_t: tuple, ys: FpArray) -> FpArray:
    """Folded-constant band path (see _band_evaluate_jit)."""
    from .band_matmul import band_matmul_limbs
    k = len(xs_t)
    batch = _numel(ys.shape[:-1])
    rows = tuple(tuple(r) for r in _lagrange_int_rows(xs_t))
    flat = ys.limbs.reshape(ys.limbs.shape[0], batch, k)
    out = band_matmul_limbs(flat, rows)
    return FpArray(out.reshape(out.shape[:1] + ys.shape[:-1] + (k,)))


@jax.jit
def _fp_matvec_jit(ys: FpArray, lam: FpArray) -> FpArray:
    return FpArray(fp_matmul(ys, lam).limbs[..., 0])


def lagrange_evaluate_at(xs, ys: FpArray, x0: int = 0) -> FpArray:
    """Evaluate the interpolant at a single point x0 via a precomputed
    Lagrange-coefficient vector (one fused dot): out[...] for ys[..., k].
    One dispatch per call; compile cached per SHAPE."""
    lam = _lagrange_coeffs_at(tuple(int(x) % P for x in xs), int(x0) % P)
    return _fp_matvec_jit(ys, lam)


def _lagrange_coeffs_at(xs: tuple, x0: int) -> FpArray:
    from .devcache import dev_const
    return FpArray(dev_const(_lagrange_coeffs_at_np(xs, x0)))


@lru_cache(maxsize=None)
def _lagrange_coeffs_at_np(xs: tuple, x0: int):
    k = len(xs)
    col = []
    for j, xj in enumerate(xs):
        num, den = 1, 1
        for m_, xm in enumerate(xs):
            if m_ != j:
                num = num * (x0 - xm) % P
                den = den * (xj - xm) % P
        col.append([num * pow(den, P - 2, P) % P])
    return _mont_np(col)
