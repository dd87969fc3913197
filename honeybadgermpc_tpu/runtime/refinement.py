"""Randomness and triple refinement (reference progs/random_refinement.py:5
and progs/triple_refinement.py:19).

refine_randoms: treat the n-t received shares as polynomial coefficients
and FFT-evaluate at powers of omega, dropping t outputs — the
hyperinvertible extraction that turns mixed honest/adversarial randomness
into unbiased randomness. Host (small control batches) and device
(FpArray batches) variants.
"""

from __future__ import annotations

from ..ops.fparray import FpArray
from ..ops.ntt import fft_evaluate
from ..ops.rs import next_pow2
from ..polynomial import get_omega_int, polynomials_over


def refine_randoms_host(n: int, t: int, field, random_shares: list) -> list:
    """Pure-host refinement for control-plane batches
    (random_refinement.py:5-19 semantics)."""
    k = n - t
    shares = random_shares[:k]
    order = next_pow2(n)
    omega = get_omega_int(field.modulus, 2 * order, seed=0) ** 2 % field.modulus
    # evaluate poly with the shares as coefficients at omega^0..omega^(k-t-1)
    out = []
    for j in range(k - t):
        x = pow(omega, j, field.modulus)
        acc = 0
        for c in reversed(shares):
            acc = (acc * x + c) % field.modulus
        out.append(acc)
    return out


def refine_randoms(n: int, t: int, shares: FpArray) -> FpArray:
    """Device batched refinement: shares[..., k] with k = n - t ->
    unbiased [..., k - t]."""
    k = n - t
    assert shares.shape[-1] == k
    order = next_pow2(n)
    from ..ops.limbs import P
    omega = pow(get_omega_int(P, 2 * order, seed=0), 2, P)
    evals = fft_evaluate(shares, omega, order)
    return FpArray(evals.limbs[..., :k - t])


def batch_beaver(ctx, a, b, x, y, xy):
    """Beaver multiply given explicit triples (triple_refinement.py:7-16)."""
    d = ctx.open_share_array(a - x)
    e = ctx.open_share_array(b - y)
    return ctx.ShareArray(d * e + d * y.v + e * x.v + xy.v, a.t)


def refine_triples(ctx, dirty_a, dirty_b, dirty_c):
    """Triple extraction from d+1 dealer-supplied triples -> k = d+1-t
    verified-independent triples (reference progs/triple_refinement.py:19-91).

    Interpolate A, B through the d+1 a/b shares at points 0..d, extend to
    2d+1 points with batch Beaver products, interpolate C of degree 2d, and
    output evaluations at fresh points. All steps are batched device ops.
    """
    import jax.numpy as jnp
    from ..ops.fpmatmul import (vandermonde_batch_evaluate,
                                vandermonde_batch_interpolate)

    d = dirty_a.v.shape[-1] - 1
    t = ctx.t
    k = d + 1 - t
    assert k >= 1
    m = 2 * d + 1
    base_xs = list(range(1, d + 2))            # interpolation points for A,B
    ext_xs = list(range(d + 2, m + 1))         # extension points
    # A, B coefficients from the dirty shares
    ca = vandermonde_batch_interpolate(base_xs, dirty_a.v)
    cb = vandermonde_batch_interpolate(base_xs, dirty_b.v)
    a_ext = vandermonde_batch_evaluate(ext_xs, ca)
    b_ext = vandermonde_batch_evaluate(ext_xs, cb)
    # c values: first d+1 are the dealer's; extension via batch beaver
    sa = ctx.ShareArray(a_ext)
    sb = ctx.ShareArray(b_ext)
    ext_c = (sa * sb)                          # Beaver via context mixin
    all_c = FpArray.concatenate([dirty_c.v, ext_c.v], axis=dirty_c.v.ndim - 1)
    cc = vandermonde_batch_interpolate(list(range(1, m + 1)), all_c)
    # evaluate A, B, C at k fresh points
    fresh = list(range(m + 1, m + 1 + k))
    out_a = vandermonde_batch_evaluate(fresh, ca)
    out_b = vandermonde_batch_evaluate(fresh, cb)
    out_c = vandermonde_batch_evaluate(fresh, cc)
    return (ctx.ShareArray(out_a), ctx.ShareArray(out_b),
            ctx.ShareArray(out_c))
