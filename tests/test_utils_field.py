"""Coverage for the small parity pieces: TypeCheck (reference
utils/typecheck.py), fake_gf (reference field.py:292-365), and the
EncoderSelector heuristic (reference reed_solomon.py:406-459)."""

import pytest

from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.field import GF, fake_gf
from honeybadgermpc_tpu.ops.rs import DecoderSelector, EncoderSelector
from honeybadgermpc_tpu.utils.typecheck import TypeCheck


def test_typecheck_raises_on_mismatch():
    @TypeCheck()
    def f(a: int, b: str):
        return a, b

    assert f(1, "x") == (1, "x")
    with pytest.raises(TypeError):
        f("oops", "x")


def test_typecheck_arithmetic_returns_notimplemented():
    @TypeCheck(arithmetic=True)
    def add(a: int, b: int):
        return a + b

    assert add(1, 2) == 3
    assert add(1, "nope") is NotImplemented


def test_typecheck_async():
    import asyncio

    @TypeCheck()
    async def g(a: int):
        return a * 2

    assert asyncio.run(g(21)) == 42
    with pytest.raises(TypeError):
        asyncio.run(g("x"))


def test_fake_gf_is_noop_field():
    F = fake_gf(Subgroup.BLS12_381)
    a, b = F(3), F(5)
    # all arithmetic returns the left operand unchanged: the stub isolates
    # communication cost from field math in benchmarks
    assert (a + b).value == 3
    assert (a * b).value == 3
    assert (a ** 7).value == 3
    r = F.random(0)
    assert 0 <= r.value < F.modulus


def test_fake_gf_distinct_from_real_gf():
    F = GF(Subgroup.BLS12_381)
    assert int(F(3) + F(5)) == 8


@pytest.mark.parametrize("n,expect_fft", [
    (4, False),        # tiny n -> Vandermonde
    (7, False),
    (128, True),       # large n -> FFT
    (256, True),
    (16, True),        # exactly a power of two
    (60, True),        # close to 64 -> little padding waste
    (33, False),       # just over 32: half the 64-domain wasted
])
def test_encoder_selector_heuristic(n, expect_fft):
    assert EncoderSelector.select(n) is expect_fft
    assert DecoderSelector is EncoderSelector
    enc = EncoderSelector.get(n)
    assert enc.n == n


def test_encoder_selector_domains_decode():
    # both selected domains must round-trip a tiny codeword
    import random

    from honeybadgermpc_tpu.ops.fparray import FpArray
    from honeybadgermpc_tpu.ops.limbs import P
    rng = random.Random(5)
    for n, k in [(4, 2), (16, 5)]:
        enc = EncoderSelector.get(n)
        coeffs = [[rng.randrange(P) for _ in range(k)]]
        shares = enc.encode(FpArray.from_ints(coeffs))
        dec = enc.decode(tuple(range(k)), FpArray(shares.limbs[..., :k]))
        got = dec.to_ints()[0]
        assert list(got) == coeffs[0]
