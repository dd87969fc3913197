"""AVSS-based robust preprocessing + refinement (mirrors reference
tests/test_offline_robust... / test_random_refinement.py /
test_triple_refinement.py)."""

import asyncio

import numpy as np
import pytest

from honeybadgermpc_tpu.crypto.boldyreva import dealer as tbls_dealer
from honeybadgermpc_tpu.field import GF
from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.polynomial import polynomials_over
from honeybadgermpc_tpu.protocols.router import TestRouter
from honeybadgermpc_tpu.runtime.context import MpcContext
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements
from honeybadgermpc_tpu.runtime.refinement import (refine_randoms,
                                                   refine_randoms_host,
                                                   refine_triples)

P = Subgroup.BLS12_381


def test_refine_randoms_device_matches_host(rng):
    n, t = 7, 2
    k = n - t
    shares = [rng.randrange(P) for _ in range(k)]
    host = refine_randoms_host(n, t, GF(P), shares)
    dev = refine_randoms(n, t, FpArray.from_ints([shares]))
    assert list(dev.to_ints()[0]) == host
    assert len(host) == k - t


def test_refine_triples(rng):
    n, t = 4, 1
    pre = PreProcessedElements(n, t, seed=31)
    pre.generate_triples(256)
    ctx = MpcContext(n, t, preproc=pre)
    # dealer-provided dirty triples (honest here): d+1 triples, d = 3
    d = 3
    a_vals = [rng.randrange(P) for _ in range(d + 1)]
    b_vals = [rng.randrange(P) for _ in range(d + 1)]
    c_vals = [a * b % P for a, b in zip(a_vals, b_vals)]
    sa = ctx.ShareArray(pre._share_values(FpArray.from_ints(a_vals)))
    sb = ctx.ShareArray(pre._share_values(FpArray.from_ints(b_vals)))
    sc = ctx.ShareArray(pre._share_values(FpArray.from_ints(c_vals)))
    ra, rb, rc = refine_triples(ctx, sa, sb, sc)
    k = d + 1 - t
    assert ra.v.shape[-1] == k
    va = ra.open().to_ints()[0]
    vb = rb.open().to_ints()[0]
    vc = rc.open().to_ints()[0]
    for x, y, xy in zip(va, vb, vc):
        assert x * y % P == xy


def test_avss_value_processor_agreement():
    from honeybadgermpc_tpu.protocols.avss_value_processor import \
        AvssValueProcessor
    pk, sks = tbls_dealer(4, 2, seed=77)
    n, t = 4, 1

    async def run():
        router = TestRouter(n, seed=13)
        qs = [asyncio.Queue() for _ in range(n)]
        procs = [AvssValueProcessor(pk, sks[i], n, t, i,
                                    router.sends[i], router.recvs[i],
                                    qs[i].get, acs_period=100).start()
                 for i in range(n)]
        # every party got values from dealers 0 and 2 (seq-ordered)
        for i in range(n):
            qs[i].put_nowait((0, 0, f"v0-{i}"))
            qs[i].put_nowait((2, 0, f"v2-{i}"))
        await asyncio.sleep(0.1)
        agreed = await asyncio.wait_for(asyncio.gather(
            *[p.run_acs_round() for p in procs]), 120)
        for p in procs:
            p.kill()
        return agreed

    agreed = asyncio.run(run())
    # all parties agree on identical per-dealer counts incl. dealers 0, 2
    assert len({tuple(a) for a in agreed}) == 1
    assert agreed[0][0] >= 1 and agreed[0][2] >= 1


def test_robust_random_generator():
    from honeybadgermpc_tpu.runtime.offline_robust import RandomGenerator
    pk, sks = tbls_dealer(4, 2, seed=78)
    n, t = 4, 1

    async def run():
        router = TestRouter(n, seed=17)
        gens = [RandomGenerator(n, t, i, router.sends[i], router.recvs[i],
                                pk=pk, sk=sks[i], batch_size=2)
                for i in range(n)]
        for g in gens:
            g.start(n_batches=1)
        outs = await asyncio.wait_for(
            asyncio.gather(*[g.get() for g in gens]), 300)
        for g in gens:
            g.kill()
        return outs

    outs = asyncio.run(run())
    # outputs are shares of a common random value: interpolate consistency
    poly = polynomials_over(GF(P))
    v1 = int(poly.interpolate_at([(1, outs[0]), (2, outs[1])], 0))
    v2 = int(poly.interpolate_at([(3, outs[2]), (4, outs[3])], 0))
    assert v1 == v2


def test_robust_random_generator_watermark_refill():
    """start() with NO batch count runs the continuous low-watermark loop
    (reference offline_robust.py:87-99): draining the output queue below
    the watermark triggers another AVSS batch without any explicit
    start(n_batches). One batch yields at most n*batch_size - t = 7 values
    here, so consuming 8 proves a refill happened."""
    from honeybadgermpc_tpu.runtime.offline_robust import RandomGenerator
    pk, sks = tbls_dealer(4, 2, seed=79)
    n, t = 4, 1
    want = 8

    async def run():
        router = TestRouter(n, seed=19)
        gens = [RandomGenerator(n, t, i, router.sends[i], router.recvs[i],
                                pk=pk, sk=sks[i], batch_size=2)
                for i in range(n)]
        for g in gens:
            g.start()                      # watermark mode: no batch count

        async def consume(g):
            return [await g.get() for _ in range(want)]

        outs = await asyncio.wait_for(
            asyncio.gather(*[consume(g) for g in gens]), 600)
        for g in gens:
            g.kill()
        return outs

    outs = asyncio.run(run())
    poly = polynomials_over(GF(P))
    for j in range(want):
        v1 = int(poly.interpolate_at(
            [(1, outs[0][j]), (2, outs[1][j])], 0))
        v2 = int(poly.interpolate_at(
            [(3, outs[2][j]), (4, outs[3][j])], 0))
        assert v1 == v2
