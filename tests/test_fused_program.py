"""Fused-program runner: whole MPC programs as one jitted device program
(runtime/fused.py), bit-exact against the eager path and the int oracle."""

import random

import pytest

from honeybadgermpc_tpu.elliptic_curve import Point, Subgroup
from honeybadgermpc_tpu.models.jubjub import SharedPoint
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.runtime.context import MpcContext
from honeybadgermpc_tpu.runtime.fused import run_fused
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

P = Subgroup.BLS12_381
N, T = 4, 1
B = 8


@pytest.fixture
def ctx():
    pre = PreProcessedElements(N, T, seed=3)
    pre.generate_triples(4096)
    pre.generate_rands(1024)
    # robust=False keeps the XLA:CPU compile of whole-program graphs small
    # (minutes vs seconds); the robust open path is covered by
    # tests/test_fused_open.py and tests/test_reconstruct.py
    return MpcContext(N, T, preproc=pre, robust=False)


def _deal(pre, values):
    return pre._share_values(FpArray.from_ints(values))


def _prog_poly(c, x):
    # x**3 + 2x (two sequential Beaver mults) opened at the end
    x2 = x * x
    x3 = x2 * x
    return (x3 + x * FpArray.from_int(2)).open()


def _prog_div(c, x, y):
    return (x / y).open()


def test_fused_matches_eager_and_oracle(ctx, rng):
    xs = [rng.randrange(P) for _ in range(B)]
    x = ctx.ShareArray(_deal(ctx.preproc, xs))
    out_f = run_fused(ctx, _prog_poly, x)
    x2 = ctx.ShareArray(_deal(ctx.preproc, xs))
    out_e = _prog_poly(ctx, x2)
    want = [(pow(v, 3, P) + 2 * v) % P for v in xs]
    got_f = [int(v) for v in out_f.to_ints()[0]]
    got_e = [int(v) for v in out_e.to_ints()[0]]
    assert got_f == want
    assert got_e == want


def test_fused_division(ctx, rng):
    xs = [rng.randrange(P) for _ in range(B)]
    ys = [rng.randrange(1, P) for _ in range(B)]
    x = ctx.ShareArray(_deal(ctx.preproc, xs))
    y = ctx.ShareArray(_deal(ctx.preproc, ys))
    out = run_fused(ctx, _prog_div, x, y)
    want = [a * pow(b, P - 2, P) % P for a, b in zip(xs, ys)]
    assert [int(v) for v in out.to_ints()[0]] == want


def _prog_jubjub_double(c, px, py):
    pt = SharedPoint(c, c.ShareArray(px.v, px.t), c.ShareArray(py.v, py.t))
    out = pt.double()                     # 2 fused secure divisions
    return out.xs, out.ys


def test_fused_jubjub_double(ctx):
    py_int = 6846412461894745224441235558443359243034138132682534265960483512729196124138  # noqa: E501
    p = Point(5, py_int)
    base_x = [int(p.x)] * B
    base_y = [int(p.y)] * B
    px = ctx.ShareArray(_deal(ctx.preproc, base_x))
    py = ctx.ShareArray(_deal(ctx.preproc, base_y))
    ox, oy = run_fused(ctx, _prog_jubjub_double, px, py)
    want = p.double()                      # plaintext oracle
    gx = int(ox.open().to_ints()[0][0])
    gy = int(oy.open().to_ints()[0][0])
    assert (gx, gy) == (int(want.x), int(want.y))


def _sq_chain_step(c, carry, ctr):
    import jax.numpy as jnp
    (x,) = carry
    x2 = x * x
    return (x2 + FpArray(jnp.broadcast_to(ctr[:, None],
                                          ctr.shape + (1,))),)


def test_fused_scan_squaring_chain(ctx, rng):
    """run_fused_scan: per-step preprocessing rides the scan axis; result
    bit-exact vs the int oracle."""
    import jax.numpy as jnp

    from honeybadgermpc_tpu.runtime.fused import run_fused_scan
    STEPS = 5
    xs0 = [rng.randrange(P) for _ in range(B)]
    x = ctx.ShareArray(_deal(ctx.preproc, xs0))
    ctrs = FpArray.from_ints(list(range(1, STEPS + 1)))
    per_step = jnp.moveaxis(ctrs.limbs, -1, 0)           # [STEPS, L]
    out, = run_fused_scan(ctx, _sq_chain_step, (x,), STEPS,
                          per_step=per_step, auto_deal=True)
    got = [int(v) for v in out.open().to_ints()[0]]
    want = list(xs0)
    for c in range(1, STEPS + 1):
        want = [(v * v + c) % P for v in want]
    assert got == want


def test_fused_cache_reuse(ctx, rng):
    # second call with same shapes must not re-trace (cache hit) and must
    # consume fresh preprocessing
    xs1 = [rng.randrange(P) for _ in range(B)]
    xs2 = [rng.randrange(P) for _ in range(B)]
    a = run_fused(ctx, _prog_poly, ctx.ShareArray(_deal(ctx.preproc, xs1)))
    b = run_fused(ctx, _prog_poly, ctx.ShareArray(_deal(ctx.preproc, xs2)))
    assert [int(v) for v in a.to_ints()[0]] == \
        [(pow(v, 3, P) + 2 * v) % P for v in xs1]
    assert [int(v) for v in b.to_ints()[0]] == \
        [(pow(v, 3, P) + 2 * v) % P for v in xs2]
