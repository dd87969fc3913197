"""MMR14 asynchronous binary agreement (reference
broadcast/binaryagreement.py:79-396).

EST/AUX/CONF rounds driven by the common coin; redundant-message senders are
rejected (:117-126); deciding twice raises AbandonedNodeError so the task
can be reaped (:299-318)."""

from __future__ import annotations

import asyncio
from collections import defaultdict

from ..utils.misc import print_exception_callback


class AbandonedNodeError(Exception):
    pass


async def binaryagreement(sid, pid, n, f, coin, input_getter, decide,
                          broadcast, receive):
    """coin: async get_coin(round) -> bit. input_getter: awaitable initial
    value. decide: callback taking the decided bit. Runs forever after
    deciding (one more round) then raises AbandonedNodeError."""
    est_values = defaultdict(lambda: [set(), set()])
    aux_values = defaultdict(lambda: [set(), set()])
    conf_values = defaultdict(lambda: {(0,): set(), (1,): set(), (0, 1): set()})
    est_sent = defaultdict(lambda: [False, False])
    conf_sent = defaultdict(lambda: {(0,): False, (1,): False, (0, 1): False})
    bin_values = defaultdict(set)

    bv_signal = asyncio.Event()

    async def _recv_loop():
        while True:
            sender, msg = await receive()
            tag, r, v = msg[0], msg[1], msg[2]
            assert sender in range(n)
            if tag == "EST":
                assert v in (0, 1)
                if sender in est_values[r][v]:
                    continue
                est_values[r][v].add(sender)
                if len(est_values[r][v]) >= f + 1 and not est_sent[r][v]:
                    est_sent[r][v] = True
                    broadcast(("EST", r, v))
                if len(est_values[r][v]) >= 2 * f + 1:
                    bin_values[r].add(v)
                    bv_signal.set()
            elif tag == "AUX":
                assert v in (0, 1)
                if sender in aux_values[r][v]:
                    continue
                aux_values[r][v].add(sender)
                bv_signal.set()
            elif tag == "CONF":
                assert v in ((0,), (1,), (0, 1))
                if sender in conf_values[r][v]:
                    continue
                conf_values[r][v].add(sender)
                bv_signal.set()

    recv_task = asyncio.ensure_future(_recv_loop())
    recv_task.add_done_callback(print_exception_callback)

    async def wait_for(predicate):
        while True:
            result = predicate()
            if result is not None:
                return result
            bv_signal.clear()
            await bv_signal.wait()

    try:
        vi = input_getter
        if callable(vi):
            vi = vi()
        if asyncio.iscoroutine(vi) or isinstance(vi, asyncio.Future):
            vi = await vi
        assert vi in (0, 1)
        est = vi
        r = 0
        already_decided = None
        while True:
            if not est_sent[r][est]:
                est_sent[r][est] = True
                broadcast(("EST", r, est))

            await wait_for(lambda: True if bin_values[r] else None)
            w = next(iter(bin_values[r]))
            broadcast(("AUX", r, w))

            def aux_ok():
                bv = bin_values[r]
                cnt = sum(len(aux_values[r][v]) for v in bv)
                if 1 in bv and len(aux_values[r][1]) >= n - f:
                    return {1}
                if 0 in bv and len(aux_values[r][0]) >= n - f:
                    return {0}
                if cnt >= n - f and len(bv) == 2:
                    return {0, 1}
                return None

            values = await wait_for(aux_ok)
            key = tuple(sorted(values))
            if not conf_sent[r][key]:
                conf_sent[r][key] = True
                broadcast(("CONF", r, key))

            def conf_ok():
                bv = bin_values[r]
                cnt = 0
                have = set()
                for k_, senders in conf_values[r].items():
                    if set(k_).issubset(bv) and senders:
                        cnt += len(senders)
                        have.update(k_)
                if 1 in bv and len(conf_values[r][(1,)]) >= n - f:
                    return {1}
                if 0 in bv and len(conf_values[r][(0,)]) >= n - f:
                    return {0}
                if cnt >= n - f:
                    return have
                return None

            values = await wait_for(conf_ok)
            s = await coin(r)
            if len(values) == 1:
                v = next(iter(values))
                if v == s % 2:
                    if already_decided is None:
                        already_decided = v
                        decide(v)
                    elif already_decided == v:
                        raise AbandonedNodeError
                est = v
            else:
                est = s % 2
            r += 1
    finally:
        recv_task.cancel()
