"""Fixed-point MPC vs float oracle (mirrors reference
tests/progs/test_fixedpoint.py) and the LessThan mixin."""

import numpy as np
import pytest

from honeybadgermpc_tpu.models.fixedpoint import FixedPointArray
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.runtime.comparison import install
from honeybadgermpc_tpu.runtime.context import MpcContext
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements


@pytest.fixture
def ctx():
    n, t = 4, 1
    pre = PreProcessedElements(n, t, seed=23)
    pre.generate_triples(16384)  # LessThan consumes ~11*255*B triples
    pre.generate_rands(256)
    pre.generate_bits(4096)
    pre.generate_zeros(64)
    pre.generate_share_bits(8)
    return install(MpcContext(n, t, preproc=pre))


def test_fixedpoint_add_sub_mul_open(ctx):
    a = FixedPointArray(ctx, [2.5, -3.8, 0.25])
    b = FixedPointArray(ctx, [-3.8, 1.5, 4.0])
    assert np.allclose(a.open(), [2.5, -3.8, 0.25])
    assert np.allclose((a + b).open(), [-1.3, -2.3, 4.25])
    assert np.allclose((a - b).open(), [6.3, -5.3, -3.75])
    got = (a * b).open()
    # trunc_pr introduces up to 1 ulp of error
    assert np.allclose(got, [-9.5, -5.7, 1.0], atol=2 ** -30)


def test_fixedpoint_neg_div(ctx):
    a = FixedPointArray(ctx, [2.5, -1.25])
    assert np.allclose(a.neg().open(), [-2.5, 1.25])
    assert np.allclose(a.div(2).open(), [1.25, -0.625], atol=2 ** -30)


def test_fixedpoint_lt(ctx):
    a = FixedPointArray(ctx, [2.5, -3.8])
    b = FixedPointArray(ctx, [-3.8, 1.5])
    lt = ctx.open_share_array(a.lt(b))
    assert list(lt.to_ints()[0]) == [0, 1]
    lt2 = ctx.open_share_array(b.lt(a))
    assert list(lt2.to_ints()[0]) == [1, 0]


def test_fixedpoint_random_and_division_grid(ctx, rng):
    """Random-valued add/sub/mul grid like the reference's
    tests/progs/test_fixedpoint.py (random * 100 vs random * -100), plus
    division by positive/negative/fractional public constants (reference
    FixedPoint.div). One test so the batch-3 multiply/truncation kernels
    compile once (CPU suite time is compile-dominated)."""
    av = [rng.random() * 100 for _ in range(3)]
    bv = [rng.random() * -100 for _ in range(3)]
    a = FixedPointArray(ctx, av)
    b = FixedPointArray(ctx, bv)
    assert np.allclose(a.open(), av, atol=1e-4)
    assert np.allclose(b.open(), bv, atol=1e-4)
    assert np.allclose((a + b).open(), np.array(av) + bv, atol=1e-4)
    assert np.allclose((a - b).open(), np.array(av) - bv, atol=1e-4)
    assert np.allclose((a * b).open(), np.array(av) * np.array(bv),
                       atol=1e-3)
    d = FixedPointArray(ctx, [10.0, -7.5, 0.375])
    assert np.allclose(d.div(4).open(), [2.5, -1.875, 0.09375], atol=1e-3)
    assert np.allclose(d.div(-2).open(), [-5.0, 3.75, -0.1875], atol=1e-3)
    assert np.allclose(d.div(0.5).open(), [20.0, -15.0, 0.75], atol=1e-3)


def test_fixedpoint_ltz_negative_boundaries(ctx):
    """Sign test at the boundaries: zero is NOT negative, one ulp below
    zero is, one ulp above is not (reference ltz, fixedpoint.py:266-268)."""
    ulp = 2.0 ** -32
    vals = [0.0, ulp, -ulp]
    a = FixedPointArray(ctx, vals)
    got = ctx.open_share_array(a.ltz())
    assert list(got.to_ints()[0]) == [0, 0, 1]


def test_fixedpoint_trunc_and_div2m_edges(ctx):
    """Deterministic trunc/div2m on exact and boundary values: x a
    multiple of 2^m, one above, and one below the next multiple
    (reference div2m/trunc, fixedpoint.py:184-211)."""
    from honeybadgermpc_tpu.models.fixedpoint import K, div2m, trunc

    m = 32
    xs = [5 << m, (5 << m) + 1, (6 << m) - 1]
    zero = ctx.from_preproc(ctx.preproc.get_zeros(len(xs)))
    x = ctx.ShareArray(zero.v + FpArray.from_ints(xs), zero.t)
    q = ctx.open_share_array(trunc(ctx, x, K, m))
    assert list(q.to_ints()[0]) == [5, 5, 5]
    r = ctx.open_share_array(div2m(ctx, x, K, m))
    assert list(r.to_ints()[0]) == [0, 1, (1 << m) - 1]


def test_less_than_mixin_field(ctx, rng):
    """Reistad LessThan on raw field shares (values < (p-1)/2)."""
    bound = (P - 1) // 2
    pairs = [(5, 9), (1 << 100, (1 << 100) + 1), (bound - 2, 3), (7, 7)]
    xs = [a for a, _ in pairs]
    ys = [b for _, b in pairs]
    sx = ctx.ShareArray(ctx.preproc._share_values(FpArray.from_ints(xs)))
    sy = ctx.ShareArray(ctx.preproc._share_values(FpArray.from_ints(ys)))
    got = ctx.open_share_array(sx < sy)
    assert list(got.to_ints()[0]) == [1 if a < b else 0 for a, b in pairs]
