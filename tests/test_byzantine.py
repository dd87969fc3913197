"""Byzantine-fault tests: protocols tolerate a mutating adversary node
(the reference's byzantine_broadcast_router mechanism,
tests/test_binaryagreement.py:12-53 — one of the two load-bearing fault
injection paths alongside induce_faults)."""

import asyncio
import random

import pytest

from honeybadgermpc_tpu.crypto.boldyreva import dealer
from honeybadgermpc_tpu.protocols.binaryagreement import binaryagreement
from honeybadgermpc_tpu.protocols.commoncoin import shared_coin
from honeybadgermpc_tpu.protocols.reliablebroadcast import reliablebroadcast
from honeybadgermpc_tpu.protocols.router import ByzantineRouter, TestRouter


@pytest.fixture(scope="module")
def tbls4():
    return dealer(4, 2, seed=42)


def _flip_aba(sender, dest, o):
    """Invert the bit of every EST/AUX message from the byznode (reference
    byzantine_router_broadcast mutation)."""
    try:
        tag = o[0]
        if tag in ("EST", "AUX"):
            return (tag, o[1], o[2] ^ 1) if len(o) == 3 else o
        if tag == "CONF":
            return None                      # drop CONFs entirely
    except Exception:
        pass
    return o


def test_binary_agreement_with_byzantine_node(tbls4):
    pk, sks = tbls4
    n, f = 4, 1
    byz = 3

    async def run():
        router = ByzantineRouter(n, byznodes={byz}, mutate=_flip_aba, seed=5)
        coin_router = TestRouter(n, seed=6)
        decisions = [asyncio.Future() for _ in range(n)]

        async def party(i):
            get_coin, ctask = await shared_coin(
                "aba-coin-byz", i, n, f, pk, sks[i],
                coin_router.broadcasts[i], coin_router.recvs[i])
            try:
                await asyncio.wait_for(binaryagreement(
                    "aba-byz", i, n, f, get_coin, i % 2,
                    decisions[i].set_result,
                    router.broadcasts[i], router.recvs[i]), 120)
            except Exception:
                pass
            finally:
                ctask.cancel()

        tasks = [asyncio.ensure_future(party(i)) for i in range(n)]
        honest = [decisions[i] for i in range(n) if i != byz]
        vals = await asyncio.wait_for(asyncio.gather(*honest), 120)
        for t in tasks:
            t.cancel()
        # agreement among honest parties despite the mutating node
        assert len(set(vals)) == 1 and vals[0] in (0, 1)

    asyncio.run(run())


def _garble_rbc(sender, dest, o):
    """Corrupt the erasure stripe in every ECHO from the byznode and turn
    READY payloads into a different root (wire format pinned by
    test_rbc_message_shapes)."""
    try:
        if o[0] == "ECHO":                   # ("ECHO", root, branch, stripe)
            return ("ECHO", o[1], o[2], b"\x00" * len(o[3]))
        if o[0] == "READY":                  # ("READY", root)
            return ("READY", b"\x13" * 32)
    except Exception:
        pass
    return o


def test_rbc_with_byzantine_echoer(tbls4):
    n, f = 4, 1
    byz = 2
    payload = b"the broadcast payload " * 10

    async def run():
        router = ByzantineRouter(n, byznodes={byz}, mutate=_garble_rbc,
                                 seed=9)

        async def party(i):
            async def getter():
                return payload

            async def receive():
                return await router.recvs[i]()

            return await asyncio.wait_for(reliablebroadcast(
                "rbc-byz", i, n, f, 0, getter, receive,
                router.sends[i]), 120)

        outs = await asyncio.gather(*[party(i) for i in range(n)
                                      if i != byz])
        assert all(o == payload for o in outs)

    asyncio.run(run())


def test_rbc_message_shapes(tbls4):
    """The mutators above must match the real wire format — pin it."""
    n, f = 4, 1

    async def run():
        seen = []

        class SpyRouter(TestRouter):
            def _make_send(self, party_id):
                inner = super()._make_send(party_id)

                def send(dest, o):
                    seen.append(o)
                    inner(dest, o)
                return send

        router = SpyRouter(n, seed=3)

        async def party(i):
            async def getter():
                return b"xyz"
            return await asyncio.wait_for(reliablebroadcast(
                "rbc-spy", i, n, f, 0, getter, router.recvs[i],
                router.sends[i]), 120)

        await asyncio.gather(*[party(i) for i in range(n)])
        tags = {o[0] for o in seen}
        assert {"VAL", "ECHO", "READY"} <= tags
        for o in seen:
            if o[0] in ("VAL", "ECHO"):
                # (tag, root, branch, stripe) — what _garble_rbc assumes
                assert len(o) == 4 and isinstance(o[3], (bytes, bytearray))
            elif o[0] == "READY":
                assert len(o) == 2

    asyncio.run(run())
