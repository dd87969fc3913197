"""Reed-Solomon erasure coding parity vs host oracle (mirrors reference
tests/test_reed_solomon.py encoder/decoder grids)."""

import numpy as np
import pytest

from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.ops.rs import Encoding, optimistic_check


def rand_ints(rng, n):
    return [rng.randrange(P) for _ in range(n)]


def poly_eval(coeffs, x):
    return sum(c * pow(x, i, P) for i, c in enumerate(coeffs)) % P


@pytest.mark.parametrize("use_fft", [False, True])
def test_encode_matches_oracle(rng, use_fft):
    n, k, batch = 7, 3, 4
    enc = Encoding(n, use_omega_powers=use_fft)
    coeffs = [rand_ints(rng, k) for _ in range(batch)]
    shares = enc.encode(FpArray.from_ints(coeffs)).to_ints()
    for b in range(batch):
        for j in range(n):
            assert shares[b][j] == poly_eval(coeffs[b], enc.points[j])


@pytest.mark.parametrize("use_fft", [
    False, pytest.param(True, marks=pytest.mark.slow)])
@pytest.mark.parametrize("zs", [(0, 1, 2), (1, 3, 6), (4, 2, 5)])
def test_decode_subsets(rng, use_fft, zs):
    n, k, batch = 7, 3, 4
    enc = Encoding(n, use_omega_powers=use_fft)
    coeffs = [rand_ints(rng, k) for _ in range(batch)]
    shares = enc.encode(FpArray.from_ints(coeffs))
    ys = shares.take(list(zs), axis=1)
    got = enc.decode(zs, ys)
    assert [list(r) for r in got.to_ints()] == coeffs


@pytest.mark.slow
def test_decode_larger_fft_domain(rng):
    # n=16 parties (t=5), k=6, subset of exactly k shares, FFT path
    n, k = 16, 6
    enc = Encoding(n, use_omega_powers=True)
    coeffs = [rand_ints(rng, k) for _ in range(3)]
    shares = enc.encode(FpArray.from_ints(coeffs))
    zs = (15, 0, 7, 3, 9, 12)
    got = enc.decode(zs, shares.take(list(zs), axis=1))
    assert [list(r) for r in got.to_ints()] == coeffs


def test_interpolate_at_zero(rng):
    n, k = 7, 3
    for use_fft in (False, True):
        enc = Encoding(n, use_omega_powers=use_fft)
        coeffs = [rand_ints(rng, k) for _ in range(2)]
        shares = enc.encode(FpArray.from_ints(coeffs))
        zs = (2, 5, 6)
        got = enc.interpolate_at(zs, shares.take(list(zs), axis=1))
        assert list(got.to_ints()) == [c[0] for c in coeffs]


def test_optimistic_check_flags_bad_shares(rng):
    n, k = 7, 3
    enc = Encoding(n)
    coeffs = [rand_ints(rng, k) for _ in range(2)]
    shares = enc.encode(FpArray.from_ints(coeffs))
    decoded = enc.decode((0, 1, 2), shares.take([0, 1, 2], axis=1))
    check_zs = (3, 4, 5)
    good = shares.take(list(check_zs), axis=1)
    ok = optimistic_check(enc, decoded, check_zs, good)
    assert bool(np.all(np.asarray(ok)))
    # corrupt party 4's share in batch row 1
    bad = good.at_set((1, 1), good[1, 1] + FpArray.from_int(1))
    ok2 = np.asarray(optimistic_check(enc, decoded, check_zs, bad))
    assert bool(ok2[0].all()) and list(ok2[1]) == [True, False, True]
