"""Native BLS12-381 backend (native/bls12_381.cpp) parity against the
pure-Python oracle (crypto/pairing.py) — the same role as the reference's
pypairing test coverage (pairing/src/lib.rs)."""

import random

import pytest

from honeybadgermpc_tpu.crypto import pairing as pp

nat = pytest.importorskip("honeybadgermpc_tpu.crypto.pairing_native")
if nat.LIB is None:
    pytest.skip("native BLS library unavailable", allow_module_level=True)


def _py_mul(p, k):
    out = pp.CurvePoint.infinity(p.b, p.F)
    base = p
    k %= pp.R
    while k > 0:
        if k & 1:
            out = out.add(base)
        base = base.double()
        k >>= 1
    return out


def test_g1_ops_parity():
    rng = random.Random(1)
    g = pp.g1_generator()
    for _ in range(3):
        k = rng.randrange(pp.R)
        assert nat.g1_mul(g, k).eq(_py_mul(g, k))
    p1, p2 = _py_mul(g, 111), _py_mul(g, 222)
    assert nat.g1_add(p1, p2).eq(p1.add(p2))
    inf = pp.CurvePoint.infinity(pp.B1, pp.Fq)
    assert nat.g1_add(p1, inf).eq(p1)
    assert nat.g1_mul(g, 0).is_infinity()
    assert nat.g1_multiexp([g, p1], [3, 5]).eq(
        _py_mul(g, 3).add(_py_mul(p1, 5)))


def test_g2_ops_parity():
    rng = random.Random(2)
    g = pp.g2_generator()
    k = rng.randrange(pp.R)
    assert nat.g2_mul(g, k).eq(_py_mul(g, k))
    assert nat.g2_add(g, _py_mul(g, 3)).eq(g.add(_py_mul(g, 3)))


def test_pairing_parity_and_bilinearity():
    g1, g2 = pp.g1_generator(), pp.g2_generator()
    import os
    os.environ["HBMPC_NO_NATIVE_BLS"] = "1"
    pp._NATIVE_TRIED, pp._NATIVE = False, None
    try:
        e_py = pp.pairing(g1, g2)
    finally:
        del os.environ["HBMPC_NO_NATIVE_BLS"]
        pp._NATIVE_TRIED, pp._NATIVE = False, None
    e_nat = nat.pairing(g1, g2)
    assert e_nat == e_py
    # bilinearity entirely through the native backend
    a, b = 9, 13
    assert nat.pairing(_py_mul(g1, a), _py_mul(g2, b)) == \
        nat.fq12_pow(e_nat, a * b)
    # identity
    inf1 = pp.CurvePoint.infinity(pp.B1, pp.Fq)
    assert nat.pairing(inf1, g2) == pp.Fq12.one()


def test_fq12_ops_parity():
    g1, g2 = pp.g1_generator(), pp.g2_generator()
    e = nat.pairing(g1, g2)
    assert nat.fq12_mul(e, nat.fq12_inv(e)) == pp.Fq12.one()
    assert nat.fq12_pow(e, 5) == e * e * e * e * e
