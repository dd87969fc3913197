"""MPC runtime: share algebra, Beaver ops, preprocessing pools, and the
MiMC program vs its plaintext oracle (mirrors reference tests/test_mpc.py
and tests/progs/test_mimc.py)."""

import numpy as np
import pytest

from honeybadgermpc_tpu.models.mimc import mimc_mpc_batch, mimc_plain
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.runtime.context import MpcContext
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements


@pytest.fixture
def ctx():
    n, t = 4, 1
    pre = PreProcessedElements(n, t, seed=11)
    pre.generate_triples(64)
    pre.generate_cubes(512)
    pre.generate_rands(16)
    pre.generate_zeros(8)
    pre.generate_bits(8)
    pre.generate_one_minus_ones(8)
    pre.generate_double_shares(8)
    return MpcContext(n, t, preproc=pre)


def share_of(ctx, values):
    """Deal shares of the given public values through the dealer kernel."""
    v = FpArray.from_ints(values)
    return ctx.ShareArray(ctx.preproc._share_values(v))


def test_linear_ops_and_open(rng, ctx):
    xs = [rng.randrange(P) for _ in range(6)]
    ys = [rng.randrange(P) for _ in range(6)]
    sx, sy = share_of(ctx, xs), share_of(ctx, ys)
    out = (sx + sy - (sx - sy)).open()   # = 2y
    for j in range(ctx.n):
        assert list(out.to_ints()[j]) == [2 * y % P for y in ys]
    pub = (sx * 7 + 5).open()
    assert list(pub.to_ints()[0]) == [(7 * x + 5) % P for x in xs]


def test_beaver_multiply(rng, ctx):
    xs = [rng.randrange(P) for _ in range(6)]
    ys = [rng.randrange(P) for _ in range(6)]
    sx, sy = share_of(ctx, xs), share_of(ctx, ys)
    prod = (sx * sy).open()
    assert list(prod.to_ints()[0]) == [x * y % P for x, y in zip(xs, ys)]


def test_invert_and_divide(rng, ctx):
    xs = [rng.randrange(1, P) for _ in range(4)]
    ys = [rng.randrange(1, P) for _ in range(4)]
    sx, sy = share_of(ctx, xs), share_of(ctx, ys)
    inv = sx.invert().open()
    assert list(inv.to_ints()[0]) == [pow(x, P - 2, P) for x in xs]
    q = (sx / sy).open()
    assert list(q.to_ints()[0]) == [x * pow(y, P - 2, P) % P for x, y in zip(xs, ys)]


def test_double_share_degree_reduction(rng, ctx):
    """DoubleSharingMultiply (share_arithmetic.py:48): local 2t product,
    open x_2t - r_2t, reduce to degree t."""
    xs = [rng.randrange(P) for _ in range(4)]
    ys = [rng.randrange(P) for _ in range(4)]
    sx, sy = share_of(ctx, xs), share_of(ctx, ys)
    prod2t = sx.local_mul(sy)
    assert prod2t.t == 2 * ctx.t
    r_t, r_2t = (ctx.from_preproc(s) for s in ctx.preproc.get_double_shares(4))
    r_2t = ctx.ShareArray(r_2t.v, 2 * ctx.t)
    diff = (prod2t - r_2t).open()
    reduced = ctx.ShareArray(r_t.v + diff)
    got = reduced.open()
    assert list(got.to_ints()[0]) == [x * y % P for x, y in zip(xs, ys)]


def test_preprocessing_kinds(ctx):
    pre = ctx.preproc
    b = ctx.from_preproc(pre.get_bits(4)).open()
    assert all(v in (0, 1) for v in b.to_ints()[0])
    pm = ctx.from_preproc(pre.get_one_minus_ones(4)).open()
    assert all(v in (1, P - 1) for v in pm.to_ints()[0])
    z = ctx.from_preproc(pre.get_zeros(4)).open()
    assert list(z.to_ints()[0]) == [0, 0, 0, 0]
    rt, r2t = pre.get_double_shares(4)
    v1 = ctx.from_preproc(rt).open()
    v2 = ctx.open_share_array(ctx.ShareArray(r2t, 2 * ctx.t))
    assert list(v1.to_ints()[0]) == list(v2.to_ints()[0])


def test_pool_exhaustion(ctx):
    with pytest.raises(AssertionError, match="exhausted"):
        ctx.preproc.get_rands(1000)


def test_mimc_batch_vs_plain(rng, ctx):
    xs = [rng.randrange(P) for _ in range(3)]
    k = rng.randrange(P)
    sx = share_of(ctx, xs)
    enc = mimc_mpc_batch(ctx, sx, k)
    got = enc.open()
    want = [mimc_plain(x, k) for x in xs]
    assert list(got.to_ints()[0]) == want


@pytest.mark.parametrize("k", [1, 2, 5, 8])
def test_multiplicative_product(rng, ctx, k):
    """dataflow.py:281 multiplicative_product: log-depth tree of batched
    Beaver multiplies (reference tests/progs/mixins/test_share_arithmetic
    test_share_array_multiplicative_product)."""
    xs = [rng.randrange(P) for _ in range(k)]
    prod = share_of(ctx, xs).multiplicative_product().open()
    want = 1
    for x in xs:
        want = want * x % P
    assert prod == want


def test_multiplicative_product_empty(ctx):
    empty = ctx.ShareArray(FpArray.zeros((ctx.n, 0)))
    assert empty.multiplicative_product().open() == 1


def test_cant_combine_shares_from_different_contexts(rng, ctx):
    """Reference tests/progs/mixins/test_share_arithmetic.py: shares are
    bound to one context; combining across contexts must raise."""
    other = MpcContext(ctx.n, ctx.t, preproc=ctx.preproc)
    xs = [rng.randrange(P) for _ in range(3)]
    a = share_of(ctx, xs)
    b = other.ShareArray(a.v)
    for op in (lambda: a + b, lambda: a - b, lambda: a * b,
               lambda: a.local_mul(b)):
        with pytest.raises(TypeError):
            op()


def test_tree_fold_additive(rng, ctx):
    xs = [rng.randrange(P) for _ in range(7)]
    total = share_of(ctx, xs).tree_fold(lambda a, b: a + b).open()
    assert total == sum(xs) % P


def test_scalar_share_ops():
    """Scalar Share surface (reference dataflow.py:50): linear ops local,
    * via Beaver mixin, open returns the agreed value."""
    from honeybadgermpc_tpu.ops.fparray import FpArray
    from honeybadgermpc_tpu.ops.limbs import P
    from honeybadgermpc_tpu.runtime.context import MpcContext
    from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

    n, t = 4, 1
    pre = PreProcessedElements(n, t, seed=0)
    pre.generate_triples(16)
    pre.generate_rands(8)
    ctx = MpcContext(n, t, preproc=pre)
    x = ctx.Share(pre._share_values(FpArray.from_ints([5])))
    y = ctx.Share(pre._share_values(FpArray.from_ints([7])))
    assert (x * y + 3 - x).open() == (5 * 7 + 3 - 5) % P
    assert (2 * x).open() == 10
    assert (x / y * y).open() == 5
