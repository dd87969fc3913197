"""Bit-exact parity of the Montgomery limb kernels vs Python-int math.

Mirrors the reference's kernel-parity strategy (tests/test_ntl.py checks the
NTL kernels against direct modular arithmetic)."""

import random

import jax
import numpy as np
import pytest

from honeybadgermpc_tpu.field import GF
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import (P, R, int_to_limbs, ints_to_limbs,
                                          limbs_to_int, limbs_to_ints)


def rand_ints(rng, n):
    return [rng.randrange(P) for _ in range(n)]


# NOTE: all FpArray tests use length-64 vectors so jitted kernels compile
# once per op for the whole module (each new shape is a fresh XLA compile).
N = 64


def pad64(xs, rng):
    return xs + rand_ints(rng, N - len(xs))


def test_limb_roundtrip(rng):
    xs = rand_ints(rng, 17)
    limbs = ints_to_limbs(xs)
    back = limbs_to_ints(limbs)
    assert list(back) == xs
    x = rng.randrange(1 << 256)
    assert limbs_to_int(int_to_limbs(x)) == x


def test_from_to_ints_roundtrip(rng):
    xs = rand_ints(rng, 64)
    fp = FpArray.from_ints(xs)
    assert fp.shape == (64,)
    assert list(fp.to_ints()) == xs


@pytest.mark.parametrize("op", ["add", "sub", "mul", "neg", "div"])
def test_arith_parity(rng, op):
    a_i, b_i = rand_ints(rng, N), rand_ints(rng, N)
    a, b = FpArray.from_ints(a_i), FpArray.from_ints(b_i)
    if op == "add":
        got, want = a + b, [(x + y) % P for x, y in zip(a_i, b_i)]
    elif op == "sub":
        got, want = a - b, [(x - y) % P for x, y in zip(a_i, b_i)]
    elif op == "mul":
        got, want = a * b, [(x * y) % P for x, y in zip(a_i, b_i)]
    elif op == "neg":
        got, want = -a, [(-x) % P for x in a_i]
    elif op == "div":
        got, want = a / b, [x * pow(y, P - 2, P) % P for x, y in zip(a_i, b_i)]
    assert list(got.to_ints()) == want


def test_arith_edge_cases(rng):
    edge = [0, 1, P - 1, P - 2, (P - 1) // 2, 2]
    xs = pad64(edge, rng)
    ys = list(reversed(xs))
    a, b = FpArray.from_ints(xs), FpArray.from_ints(ys)
    for x, y, s, d, m in zip(xs, ys, (a + b).to_ints(),
                             (a - b).to_ints(), (a * b).to_ints()):
        assert s == (x + y) % P
        assert d == (x - y) % P
        assert m == (x * y) % P
    negs = (-FpArray.from_ints(xs)).to_ints()
    assert list(negs) == [(-x) % P for x in xs]


def test_inverse(rng):
    xs = pad64([1, P - 1, 0], rng)
    fp = FpArray.from_ints(xs)
    inv = fp.inv()
    # inv(0) = 0 convention
    assert list(inv.to_ints()) == [pow(x, P - 2, P) if x else 0 for x in xs]


def test_pow_static(rng):
    xs = rand_ints(rng, N)
    fp = FpArray.from_ints(xs)
    for e in [0, 3, 65537, (P - 1) // 2]:
        assert list(fp.pow_static(e).to_ints()) == [pow(x, e, P) for x in xs]


def test_sqrt(rng):
    xs = [x * x % P for x in rand_ints(rng, N - 1)]
    fp = FpArray.from_ints(xs + [5])  # 5 is the smallest QNR mod p
    assert pow(5, (P - 1) // 2, P) == P - 1
    r, ok = fp.sqrt()
    ok = np.asarray(ok)
    assert bool(np.all(ok[:-1])) and not bool(ok[-1])
    for x, g in zip(xs, r.to_ints()):
        assert g * g % P == x


def test_predicates_and_select(rng):
    x4, y4 = [0, 5, 7, 0], [1, 5, 8, 0]
    pad = rand_ints(rng, N - 4)
    a = FpArray.from_ints(x4 + pad)
    b = FpArray.from_ints(y4 + pad)
    assert list(np.asarray(a.is_zero()))[:4] == [True, False, False, True]
    assert list(np.asarray(a.eq(b)))[:4] == [False, True, False, True]
    sel = FpArray.select(a.eq(b), a, b)
    assert list(sel.to_ints())[:4] == [1, 5, 8, 0]


def test_rand_reduction():
    key = jax.random.PRNGKey(0)
    fp = FpArray.rand(key, (N,))
    vals = fp.to_ints()
    assert all(0 <= v < P for v in vals)
    assert len(set(vals)) == N


def test_jit_and_vmap_compose(rng):
    xs, ys = rand_ints(rng, N), rand_ints(rng, N)
    a, b = FpArray.from_ints(xs), FpArray.from_ints(ys)

    @jax.jit
    def f(a, b):
        return a * b + a - b

    got = f(a, b).to_ints()
    want = [(x * y + x - y) % P for x, y in zip(xs, ys)]
    assert list(got) == want


def test_shapes_and_indexing(rng):
    xs = rand_ints(rng, N)
    a = FpArray.from_ints(xs).reshape(4, 16)
    assert a.shape == (4, 16)
    got = a.to_ints()
    assert got[1][2] == xs[18]
    assert list(a.T.to_ints()[0]) == xs[0::16]
    c = FpArray.concatenate([a, a], axis=0)
    assert c.shape == (8, 16)


def test_host_field_oracle(galois_field):
    f = galois_field
    a, b = f(12345), f(67890)
    assert int(a + b) == (12345 + 67890) % P
    assert int(a * b) == 12345 * 67890 % P
    assert int(~a * a) == 1
    assert int(a ** 3) == pow(12345, 3, P)
    s = (a * a).sqrt()
    assert int(s * s) == int(a * a)
    # seeded draw parity contract (Mersenne-Twister)
    assert int(f.random(0)) == random.Random(0).randint(0, P - 1)
