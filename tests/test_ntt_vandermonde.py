"""Kernel parity: device NTT / Vandermonde vs host polynomial oracle
(mirrors reference tests/test_ntl.py strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from honeybadgermpc_tpu.field import GF
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.fpmatmul import (lagrange_evaluate_at,
                                             vandermonde_batch_evaluate,
                                             vandermonde_batch_interpolate)
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.ops.ntt import (fft_evaluate, fft_interpolate,
                                        interp_extrap, intt, ntt)
from honeybadgermpc_tpu.polynomial import EvalPoint, get_omega, polynomials_over


def rand_ints(rng, n):
    return [rng.randrange(P) for _ in range(n)]


@pytest.fixture(scope="module")
def omega16():
    return int(get_omega(GF(P), 16, seed=0))


def test_ntt_matches_naive(rng, omega16):
    n, batch = 16, 4
    coeffs = [rand_ints(rng, n) for _ in range(batch)]
    x = FpArray.from_ints(coeffs)
    y = ntt(x, omega16)
    got = y.to_ints()
    for b in range(batch):
        for j in range(n):
            want = sum(c * pow(omega16, i * j, P) for i, c in enumerate(coeffs[b])) % P
            assert got[b][j] == want, (b, j)


def test_intt_roundtrip(rng, omega16):
    n, batch = 16, 8
    coeffs = [rand_ints(rng, n) for _ in range(batch)]
    x = FpArray.from_ints(coeffs)
    back = intt(ntt(x, omega16), omega16)
    assert [list(r) for r in back.to_ints()] == coeffs


def test_fft_evaluate_truncated_vs_oracle(rng, omega16):
    f = GF(P)
    poly = polynomials_over(f)
    k = 5
    cs = rand_ints(rng, k)
    evals = fft_evaluate(FpArray.from_ints([cs]), omega16, 16, k=7)
    assert evals.shape == (1, 7)
    oracle = poly(cs).evaluate_fft(f(omega16), 16)
    assert list(evals.to_ints()[0]) == [int(v) for v in oracle[:7]]


def test_fft_interpolate_vs_oracle(rng, omega16):
    f = GF(P)
    poly = polynomials_over(f)
    ys = rand_ints(rng, 16)
    got = fft_interpolate(FpArray.from_ints([ys]), omega16)
    oracle = poly.interpolate_fft(ys, f(omega16))
    assert list(got.to_ints()[0]) == [int(c) for c in oracle.coeffs]


def test_interp_extrap_vs_oracle(rng):
    f = GF(P)
    poly = polynomials_over(f)
    omega = int(get_omega(f, 16, seed=0))
    xs = rand_ints(rng, 8)
    got = interp_extrap(FpArray.from_ints([xs]), omega)
    oracle = poly.interp_extrap(xs, f(omega))
    assert list(got.to_ints()[0]) == [int(v) for v in oracle]


def test_vandermonde_evaluate(rng):
    xs = list(range(1, 8))  # party points i+1 (EvalPoint non-FFT mode)
    k, batch = 3, 5
    coeffs = [rand_ints(rng, k) for _ in range(batch)]
    got = vandermonde_batch_evaluate(xs, FpArray.from_ints(coeffs)).to_ints()
    for b in range(batch):
        for j, x in enumerate(xs):
            want = sum(c * pow(x, i, P) for i, c in enumerate(coeffs[b])) % P
            assert got[b][j] == want


def test_vandermonde_interpolate_roundtrip(rng):
    xs = [rng.randrange(1, P) for _ in range(6)]
    k, batch = 6, 3
    coeffs = [rand_ints(rng, k) for _ in range(batch)]
    ys = vandermonde_batch_evaluate(xs, FpArray.from_ints(coeffs))
    back = vandermonde_batch_interpolate(xs, ys)
    assert [list(r) for r in back.to_ints()] == coeffs


def test_lagrange_evaluate_at_zero(rng):
    # Shamir reconstruction: degree-2 secret sharing opened from 3 shares
    secret = rand_ints(rng, 1)[0]
    coeffs = [secret] + rand_ints(rng, 2)
    xs = [1, 2, 3]
    shares = [sum(c * pow(x, i, P) for i, c in enumerate(coeffs)) % P for x in xs]
    got = lagrange_evaluate_at(xs, FpArray.from_ints([shares]))
    assert got.to_ints()[0] == secret


def test_evalpoint_parity():
    """EvalPoint FFT-mode omega must match the reference's seeded draw."""
    f = GF(P)
    ep = EvalPoint(f, 4, use_omega_powers=True)
    assert ep.order == 4
    assert int(ep.omega2 ** (2 * ep.order)) == 1
    assert int(ep(0)) == 1
    assert int(ep(1)) == int(ep.omega)
    ep_v = EvalPoint(f, 4)
    assert [int(ep_v(i)) for i in range(4)] == [1, 2, 3, 4]


def test_host_poly_divmod(rng):
    f = GF(P)
    poly = polynomials_over(f)
    a = poly.random(7, seed=1)
    b = poly.random(3, seed=2)
    q, r = divmod(a, b)
    assert q * b + r == a
    assert r.degree() < b.degree()


def test_partial_fft_matches_full():
    """partial_fft = first k outputs of the n-point NTT (pyx:266)."""
    import jax

    from honeybadgermpc_tpu.ops.fparray import FpArray
    from honeybadgermpc_tpu.ops.limbs import P
    from honeybadgermpc_tpu.ops.ntt import fft_evaluate, partial_fft
    from honeybadgermpc_tpu.polynomial import get_omega_int

    n, k, deg = 16, 5, 7
    omega = get_omega_int(P, n, seed=0)
    coeffs = FpArray.rand(jax.random.PRNGKey(0), (3, deg))
    full = fft_evaluate(coeffs, omega, n).to_ints()
    part = partial_fft(coeffs, omega, n, k).to_ints()
    for b in range(3):
        assert list(part[b]) == list(full[b][:k])


def test_band_matmul_interpret():
    """Host-constant folded-band matmul (ops/band_matmul.py) bit-exact in
    Pallas interpret mode — the TPU path behind big-batch Vandermonde
    evaluate/interpolate."""
    import random

    import jax

    from honeybadgermpc_tpu.ops.band_matmul import band_matmul_limbs
    from honeybadgermpc_tpu.ops.fparray import FpArray
    from honeybadgermpc_tpu.ops.limbs import P

    rng = random.Random(77)
    k, m, B = 6, 10, 130   # forces lane padding (B % 128 != 0)
    mat = tuple(tuple(rng.randrange(P) for _ in range(m)) for _ in range(k))
    a_int = [[rng.randrange(P) for _ in range(k)] for _ in range(B)]
    a = FpArray.from_ints(a_int)
    out = FpArray(jax.jit(
        lambda l: band_matmul_limbs(l, mat))(a.limbs)).to_ints()
    for b in (0, 63, B - 1):
        for j in (0, m - 1):
            want = sum(a_int[b][i] * mat[i][j] for i in range(k)) % P
            assert int(out[b][j]) == want, (b, j)
