"""BKR93 asynchronous common subset (reference
broadcast/commonsubset.py:6-182): n RBCs + n ABAs. RBC_j completion feeds
ABA_j input 1; once n-f ABAs decide 1, all undecided ABAs get input 0; the
output is the agreed index set with its RBC payloads."""

from __future__ import annotations

import asyncio

from ..utils.misc import print_exception_callback, subscribe_recv, wrap_send
from .binaryagreement import AbandonedNodeError, binaryagreement
from .commoncoin import shared_coin
from .reliablebroadcast import reliablebroadcast


async def commonsubset(pid, n, f, rbc_out_futures, aba_in_queues,
                       aba_out_futures):
    """Core wiring (commonsubset.py:6-67): rbc_out_futures[j] resolves to
    RBC_j's value; aba_in_queues[j] receives the ABA input; aba_out_futures
    resolve to decisions. Returns tuple of values (None for excluded)."""
    aba_inputted = [False] * n

    async def _recv_rbc(j):
        await rbc_out_futures[j]
        if not aba_inputted[j]:
            aba_inputted[j] = True
            aba_in_queues[j].put_nowait(1)

    r_threads = [asyncio.ensure_future(_recv_rbc(j)) for j in range(n)]

    async def _recv_aba(j):
        await aba_out_futures[j]
        ones = sum(1 for fut in aba_out_futures
                   if fut.done() and fut.result() == 1)
        if ones >= n - f:
            for k in range(n):
                if not aba_inputted[k]:
                    aba_inputted[k] = True
                    aba_in_queues[k].put_nowait(0)

    a_threads = [asyncio.ensure_future(_recv_aba(j)) for j in range(n)]

    aba_values = await asyncio.gather(*aba_out_futures)
    assert sum(aba_values) >= n - f

    outputs = []
    for j in range(n):
        if aba_values[j] == 1:
            outputs.append(await rbc_out_futures[j])
        else:
            outputs.append(None)
    for t in r_threads:
        t.cancel()
    return tuple(outputs)


async def run_common_subset(sid, pid, n, f, coin_keys, my_input: bytes,
                            send, recv):
    """Self-contained ACS instance over one tag-multiplexed link
    (make_commonsubset wiring, commonsubset.py:70-161). coin_keys =
    (public_key, private_key) for the shared coin. Returns the tuple of
    delivered payloads (None for non-included parties)."""
    pk, sk = coin_keys
    recv_task, subscribe = subscribe_recv(recv)

    def _make(tag):
        return wrap_send(tag, send), subscribe(tag)

    rbc_out_futures = [asyncio.Future() for _ in range(n)]
    aba_in_queues = [asyncio.Queue() for _ in range(n)]
    aba_out_futures = [asyncio.Future() for _ in range(n)]

    tasks = []
    coin_recv_tasks = []
    for j in range(n):
        # RBC_j
        rbc_send, rbc_recv = _make(f"{sid}RBC{j}")

        async def _rbc(j=j, rbc_send=rbc_send, rbc_recv=rbc_recv):
            m = await reliablebroadcast(
                f"{sid}RBC{j}", pid, n, f, j,
                (lambda: _ready(my_input)) if j == pid else None,
                rbc_recv, lambda d, o: rbc_send(d, o))
            rbc_out_futures[j].set_result(m)

        tasks.append(asyncio.ensure_future(_rbc()))

        # coin + ABA_j
        coin_send, coin_recv = _make(f"{sid}COIN{j}")
        aba_send, aba_recv = _make(f"{sid}ABA{j}")

        async def _aba(j=j, coin_send=coin_send, coin_recv=coin_recv,
                       aba_send=aba_send, aba_recv=aba_recv):
            def bcast_coin(o):
                for d in range(n):
                    coin_send(d, o)
            coin, ctask = await shared_coin(
                f"{sid}COIN{j}", pid, n, f, pk, sk, bcast_coin, coin_recv)
            coin_recv_tasks.append(ctask)

            def bcast_aba(o):
                for d in range(n):
                    aba_send(d, o)

            async def aba_input():
                return await aba_in_queues[j].get()

            try:
                await binaryagreement(
                    f"{sid}ABA{j}", pid, n, f, coin, aba_input,
                    aba_out_futures[j].set_result, bcast_aba, aba_recv)
            except AbandonedNodeError:
                pass

        tasks.append(asyncio.ensure_future(_aba()))

    for t in tasks:
        t.add_done_callback(print_exception_callback)

    acs = asyncio.ensure_future(commonsubset(
        pid, n, f, rbc_out_futures, aba_in_queues, aba_out_futures))
    try:
        return await acs
    finally:
        for t in tasks + coin_recv_tasks:
            t.cancel()
        recv_task.cancel()


async def _ready(value):
    return value
