"""Consensus substrate: pairing, threshold BLS, common coin, binary
agreement, asynchronous common subset (mirrors reference
tests/test_commoncoin.py, test_binaryagreement.py, test_commonsubset.py,
crypto/test_boldyreva.py)."""

import asyncio
import pickle

import pytest

from honeybadgermpc_tpu.betterpairing import G1, G2, ZR, interpolate_g1_at_x, pair
from honeybadgermpc_tpu.crypto.boldyreva import dealer
from honeybadgermpc_tpu.protocols.binaryagreement import binaryagreement
from honeybadgermpc_tpu.protocols.commoncoin import shared_coin
from honeybadgermpc_tpu.protocols.commonsubset import run_common_subset
from honeybadgermpc_tpu.protocols.router import SimpleRouter, TestRouter


@pytest.fixture(scope="module")
def tbls4():
    return dealer(4, 2, seed=42)


def test_pairing_group_api():
    g, h = G1.rand(1), G1.rand(2)
    a, b = ZR.rand(3), ZR.rand(4)
    assert (g ** a) ** b == g ** (a * b)
    assert g * h == h * g
    e = pair(g, G2())
    assert e ** a == pair(g ** a, G2())
    # serialization roundtrip
    blob = pickle.dumps(g ** a)
    assert pickle.loads(blob) == g ** a


def test_lagrange_in_exponent():
    # secret poly f(x) = 5 + 3x; points at x=1..3 in the exponent
    g = G1()
    coords = [(x, g ** ZR(5 + 3 * x)) for x in (1, 2, 3)]
    assert interpolate_g1_at_x(coords, 0) == g ** ZR(5)
    assert interpolate_g1_at_x(coords, 4) == g ** ZR(17)


def test_boldyreva_threshold_sig(tbls4):
    pk, sks = tbls4
    h = pk.hash_message(b"hi")
    sigs = {i: sks[i].sign(h) for i in range(4)}
    for i in range(4):
        assert pk.verify_share(sigs[i], i, h)
    sig = pk.combine_shares({0: sigs[0], 2: sigs[2]})
    assert pk.verify_signature(sig, h)
    # any other pair combines to the same signature
    sig2 = pk.combine_shares({1: sigs[1], 3: sigs[3]})
    assert sig == sig2
    assert not pk.verify_share(sigs[1], 0, h)


def test_common_coin(tbls4):
    pk, sks = tbls4
    n, f = 4, 1

    async def run():
        router = TestRouter(n, seed=1)
        coins = []

        async def party(i):
            get_coin, task = await shared_coin(
                "coin-sid", i, n, f, pk, sks[i],
                router.broadcasts[i], router.recvs[i])
            vals = [await get_coin(r) for r in range(3)]
            task.cancel()
            return vals

        res = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 120)
        # all parties agree on every round's coin
        for r in range(3):
            assert len({res[i][r] for i in range(n)}) == 1
            assert res[0][r] in (0, 1)

    asyncio.run(run())


@pytest.mark.parametrize("inputs", [[1, 1, 1, 1], [0, 0, 0, 0], [0, 1, 0, 1]])
def test_binary_agreement(tbls4, inputs):
    pk, sks = tbls4
    n, f = 4, 1

    async def run():
        router = TestRouter(n, seed=7)
        coin_router = TestRouter(n, seed=8)
        decisions = [asyncio.Future() for _ in range(n)]

        async def party(i):
            get_coin, ctask = await shared_coin(
                "aba-coin", i, n, f, pk, sks[i],
                coin_router.broadcasts[i], coin_router.recvs[i])
            try:
                await asyncio.wait_for(binaryagreement(
                    "aba", i, n, f, get_coin, inputs[i],
                    decisions[i].set_result,
                    router.broadcasts[i], router.recvs[i]), 120)
            except Exception:
                pass
            finally:
                ctask.cancel()

        tasks = [asyncio.ensure_future(party(i)) for i in range(n)]
        vals = await asyncio.wait_for(asyncio.gather(*decisions), 120)
        for t in tasks:
            t.cancel()
        assert len(set(vals)) == 1
        if len(set(inputs)) == 1:
            assert vals[0] == inputs[0]  # validity

    asyncio.run(run())


def test_common_subset(tbls4):
    pk, sks = tbls4
    n, f = 4, 1

    async def run():
        router = TestRouter(n, seed=11)

        async def party(i):
            return await run_common_subset(
                "acs", i, n, f, (pk, sks[i]),
                f"input from {i}".encode(),
                router.sends[i], router.recvs[i])

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 300)
        # all parties agree on the same subset
        assert len({tuple(o) for o in outs}) == 1
        included = [v for v in outs[0] if v is not None]
        assert len(included) >= n - f
        for v in included:
            assert v.startswith(b"input from ")

    asyncio.run(run())
