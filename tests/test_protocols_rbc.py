"""Erasure codes, Merkle trees, reliable broadcast over the simulated
async network (mirrors reference tests/test_reliablebroadcast.py)."""

import asyncio

import pytest

from honeybadgermpc_tpu.protocols import erasure
from honeybadgermpc_tpu.protocols.merkle import (merkle_branch, merkle_root,
                                                 merkle_tree, merkle_verify)
from honeybadgermpc_tpu.protocols.reliablebroadcast import reliablebroadcast
from honeybadgermpc_tpu.protocols.router import SimpleRouter, TestRouter


def test_erasure_roundtrip():
    for k, n in [(2, 4), (3, 7), (5, 16)]:
        data = bytes(range(256)) * 3 + b"tail"
        stripes = erasure.encode(k, n, data)
        # drop all but k stripes (worst case)
        kept = [None] * n
        for j in list(range(n))[-k:]:
            kept[j] = stripes[j]
        assert erasure.decode(k, n, kept) == data


def test_erasure_small_and_empty():
    assert erasure.decode(2, 4, erasure.encode(2, 4, b"")) == b""
    assert erasure.decode(2, 4, erasure.encode(2, 4, b"x")) == b"x"


def test_merkle_branch_verify():
    leaves = [f"leaf{i}".encode() for i in range(7)]
    tree = merkle_tree(leaves)
    root = merkle_root(tree)
    for i, leaf in enumerate(leaves):
        br = merkle_branch(tree, i)
        assert merkle_verify(7, leaf, root, br, i)
        assert not merkle_verify(7, b"forged", root, br, i)
        assert not merkle_verify(7, leaf, root, br, (i + 1) % 7)


@pytest.mark.parametrize("n,f", [(4, 1), (7, 2)])
@pytest.mark.parametrize("msg_len", [10, 2000])
def test_rbc_all_deliver(n, f, msg_len):
    async def run():
        router = TestRouter(n, seed=5)
        msg = bytes(i % 251 for i in range(msg_len))
        leader = 2 % n

        async def party(i):
            async def input_getter():
                return msg
            return await reliablebroadcast(
                "sid", i, n, f, leader,
                input_getter if i == leader else None,
                router.recvs[i], router.sends[i])

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), timeout=30)
        assert all(o == msg for o in outs)

    asyncio.run(run())


def test_rbc_tolerates_silent_faults():
    """f crashed parties: the rest still deliver."""
    n, f = 4, 1

    async def run():
        router = SimpleRouter(n)
        msg = b"fault tolerant payload"

        async def party(i):
            return await reliablebroadcast(
                "sid", i, n, f, 0, msg if i == 0 else None,
                router.recvs[i], router.sends[i])

        # party 3 never participates
        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n - 1)]), timeout=30)
        assert all(o == msg for o in outs)

    asyncio.run(run())
