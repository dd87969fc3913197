"""Gao robust decoding with injected faults (mirrors reference
tests/test_reed_solomon.py robust-decoder grids and benchmark parameters)."""

import numpy as np
import pytest

from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.gao import gao_decode_with_errors
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.ops.rs import Encoding


def rand_ints(rng, n):
    return [rng.randrange(P) for _ in range(n)]


def make_shares(rng, enc, k, batch):
    coeffs = [rand_ints(rng, k) for _ in range(batch)]
    return coeffs, enc.encode(FpArray.from_ints(coeffs))


@pytest.mark.parametrize("use_fft", [False, True])
@pytest.mark.parametrize("t", [1, 2])
def test_gao_corrects_t_errors(rng, use_fft, t):
    n = 3 * t + 1
    k = t + 1
    batch = 3
    enc = Encoding(n, use_omega_powers=use_fft)
    coeffs, shares = make_shares(rng, enc, k, batch)
    # corrupt t different parties per batch row
    corrupted = shares
    bad_parties = [sorted(rng.sample(range(n), t)) for _ in range(batch)]
    for b in range(batch):
        for z in bad_parties[b]:
            corrupted = corrupted.at_set(
                (b, z), corrupted[b, z] + FpArray.from_int(1 + z))
    zs = tuple(range(n))
    dec, err, ok = gao_decode_with_errors(enc, zs, corrupted, k)
    assert bool(np.all(np.asarray(ok)))
    got = dec.to_ints()
    for b in range(batch):
        assert list(got[b]) == coeffs[b]
        errs = [i for i, e in enumerate(np.asarray(err)[b]) if e]
        assert errs == bad_parties[b]


def test_gao_no_errors(rng):
    n, k = 7, 3
    enc = Encoding(n)
    coeffs, shares = make_shares(rng, enc, k, 2)
    dec, err, ok = gao_decode_with_errors(enc, tuple(range(n)), shares, k)
    assert bool(np.all(np.asarray(ok)))
    assert not np.asarray(err).any()
    assert [list(r) for r in dec.to_ints()] == coeffs


def test_gao_partial_subset(rng):
    # m = k + 2e shares available out of n
    n, t = 10, 2
    k, e = t + 1, 2
    m = k + 2 * e
    enc = Encoding(n)
    coeffs, shares = make_shares(rng, enc, k, 2)
    zs = (0, 2, 3, 5, 7, 8, 9)
    assert len(zs) == m
    sub = shares.take(list(zs), axis=1)
    sub = sub.at_set((0, 1), sub[0, 1] + FpArray.from_int(5))  # party 2 bad
    sub = sub.at_set((0, 4), sub[0, 4] + FpArray.from_int(9))  # party 7 bad
    dec, err, ok = gao_decode_with_errors(enc, zs, sub, k)
    assert bool(np.all(np.asarray(ok)))
    assert [list(r) for r in dec.to_ints()] == coeffs
    assert list(np.flatnonzero(np.asarray(err)[0])) == [1, 4]


def test_gao_too_many_errors_flagged(rng):
    n, t = 7, 2  # corrects at most (7-3)//2 = 2 errors
    k = t + 1
    enc = Encoding(n)
    coeffs, shares = make_shares(rng, enc, k, 1)
    bad = shares
    for z in range(4):  # 4 > 2 errors
        bad = bad.at_set((0, z), bad[0, z] + FpArray.from_int(z + 1))
    dec, err, ok = gao_decode_with_errors(enc, tuple(range(n)), bad, k)
    got_ok = bool(np.asarray(ok)[0])
    if got_ok:
        # decoding "succeeded" onto some codeword — it must NOT be the
        # original (4 errors moved us into another ball) — or the error
        # count must exceed capacity, which callers screen via err sum
        assert list(dec.to_ints()[0]) != coeffs[0] or int(np.asarray(err).sum()) > 2
    else:
        assert not got_ok
