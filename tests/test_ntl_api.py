"""API-parity tests for honeybadgermpc_tpu.ntl (reference
honeybadgermpc/ntl surface, tests modeled on reference tests/test_ntl.py:
every kernel checked against direct modular arithmetic in Python)."""

import random

import pytest

from honeybadgermpc_tpu import ntl
from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.polynomial import get_omega_int

P = Subgroup.BLS12_381


@pytest.fixture
def rng():
    return random.Random(31337)


def _poly_eval(coeffs, x, p=P):
    return sum(c * pow(x, i, p) for i, c in enumerate(coeffs)) % p


def test_lagrange_interpolate_and_evaluate(rng):
    coeffs = [rng.randrange(P) for _ in range(5)]
    xs = list(range(1, 6))
    ys = [_poly_eval(coeffs, x) for x in xs]
    got = ntl.lagrange_interpolate(xs, ys, P)
    assert got == coeffs
    assert ntl.evaluate(coeffs, 7, P) == _poly_eval(coeffs, 7)


def test_vandermonde_batch_roundtrip(rng):
    polys = [[rng.randrange(P) for _ in range(4)] for _ in range(3)]
    xs = list(range(1, 5))
    evals = ntl.vandermonde_batch_evaluate(xs, polys, P)
    for q, row in zip(polys, evals):
        assert row == [_poly_eval(q, x) for x in xs]
    back = ntl.vandermonde_batch_interpolate(xs, evals, P)
    assert back == polys


def test_vandermonde_inverse(rng):
    xs = [1, 2, 3, 4]
    inv = ntl.vandermonde_inverse(xs, P)
    # V[i][j] = xs[j]^i; check V @ inv == I
    k = len(xs)
    for i in range(k):
        for j in range(k):
            acc = sum(pow(xs[m], i, P) * inv[m][j] for m in range(k)) % P
            assert acc == (1 if i == j else 0)


def test_fft_and_partial_fft(rng):
    n = 8
    omega = get_omega_int(P, n, seed=0)
    coeffs = [rng.randrange(P) for _ in range(n)]
    out = ntl.fft(coeffs, omega, P, n)
    assert out == [_poly_eval(coeffs, pow(omega, i, P)) for i in range(n)]
    assert ntl.partial_fft(coeffs, omega, P, n, 3) == out[:3]
    batch = ntl.fft_batch_evaluate([coeffs, coeffs], omega, P, n, n)
    assert batch == [out, out]


def test_fft_interpolate(rng):
    n = 8
    omega = get_omega_int(P, n, seed=0)
    coeffs = [rng.randrange(P) for _ in range(3)]
    zs = [0, 2, 5]
    ys = [_poly_eval(coeffs, pow(omega, z, P)) for z in zs]
    got = ntl.fft_interpolate(zs, ys, omega, P, n)
    assert got[:3] == coeffs and not any(got[3:])
    gotb = ntl.fft_batch_interpolate(zs, [ys, ys], omega, P, n)
    assert gotb[0][:3] == coeffs


def test_gao_interpolate_device_and_errors(rng):
    k, m = 3, 9                      # tolerates (9-3)//2 = 3 errors
    coeffs = [rng.randrange(P) for _ in range(k)]
    xs = list(range(1, m + 1))
    ys = [_poly_eval(coeffs, x) for x in xs]
    ys[1] = (ys[1] + 17) % P
    ys[6] = (ys[6] + 1) % P
    msg, errp = ntl.gao_interpolate(xs, ys, k, P)
    assert msg[:k] == coeffs
    # error poly vanishes exactly at the corrupted points
    assert ntl.evaluate(errp, xs[1], P) == 0
    assert ntl.evaluate(errp, xs[6], P) == 0
    assert ntl.evaluate(errp, xs[0], P) != 0


def test_gao_interpolate_erasures(rng):
    k, m = 2, 6
    coeffs = [rng.randrange(P) for _ in range(k)]
    xs = list(range(1, m + 1))
    ys = [_poly_eval(coeffs, x) for x in xs]
    ys[0] = None                      # erasure, reference drops it
    ys[4] = (ys[4] + 5) % P           # plus one error
    msg, errp = ntl.gao_interpolate(xs, ys, k, P)
    assert msg[:k] == coeffs


def test_gao_host_fallback_small_modulus(rng):
    p = 97
    k, m = 2, 6
    coeffs = [5, 11]
    xs = list(range(1, m + 1))
    ys = [(coeffs[0] + coeffs[1] * x) % p for x in xs]
    ys[2] = (ys[2] + 1) % p
    msg, errp = ntl.gao_interpolate(xs, ys, k, p)
    assert msg[:k] == coeffs
    assert ntl.evaluate(errp, xs[2], p) == 0


def test_host_fallback_other_modulus(rng):
    p = 2 ** 31 - 1                   # Mersenne prime != BLS
    coeffs = [3, 1, 4]
    xs = [1, 2, 3]
    ys = [_poly_eval(coeffs, x, p) for x in xs]
    assert ntl.lagrange_interpolate(xs, ys, p) == coeffs
    evals = ntl.vandermonde_batch_evaluate(xs, [coeffs], p)
    assert evals == [ys]


def test_sqrt_mod(rng):
    for _ in range(4):
        v = rng.randrange(1, P)
        sq = v * v % P
        r = ntl.sqrt_mod(sq, P)
        assert r * r % P == sq


def test_thread_controls_noop():
    ntl.SetNumThreads(4)
    ntl.SetNTLNumThreads(4)
    assert ntl.AvailableNTLThreads() == 1
    assert ntl.GetMaxThreads() == 1
