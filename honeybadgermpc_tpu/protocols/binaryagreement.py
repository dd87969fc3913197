"""MMR14 asynchronous binary agreement (reference
broadcast/binaryagreement.py:79-396).

EST/AUX/CONF rounds driven by the common coin; redundant-message senders are
rejected (:117-126); deciding twice raises AbandonedNodeError so the task
can be reaped (:299-318)."""

from __future__ import annotations

import asyncio
from collections import defaultdict

from ..utils.misc import print_exception_callback

_SUBSETS = ((0,), (1,), (0, 1))


class AbandonedNodeError(Exception):
    pass


class _Round:
    """Tallies for one MMR14 round: which parties voted what, per stage."""

    __slots__ = ("voters", "subset_voters", "echoed", "confed", "accepted")

    def __init__(self):
        # stage -> bit -> set of party ids ("est"/"aux" stages)
        self.voters = {"est": ([set(), set()]), "aux": ([set(), set()])}
        # CONF carries a subset of {0,1} rather than a single bit
        self.subset_voters = {s: set() for s in _SUBSETS}
        self.echoed = [False, False]          # did I relay EST for bit b
        self.confed = {s: False for s in _SUBSETS}  # did I send CONF for s
        self.accepted = set()                 # bits with a 2f+1 EST quorum


async def binaryagreement(sid, pid, n, f, coin, input_getter, decide,
                          broadcast, receive):
    """coin: async get_coin(round) -> bit. input_getter: awaitable initial
    value. decide: callback taking the decided bit. Runs forever after
    deciding (one more round) then raises AbandonedNodeError."""
    rounds = defaultdict(_Round)
    progress = asyncio.Event()

    async def _ingest():
        while True:
            sender, msg = await receive()
            tag, r, payload = msg[0], msg[1], msg[2]
            assert sender in range(n)
            st = rounds[r]
            if tag == "EST":
                assert payload in (0, 1)
                tally = st.voters["est"][payload]
                if sender in tally:
                    continue
                tally.add(sender)
                if len(tally) >= f + 1 and not st.echoed[payload]:
                    st.echoed[payload] = True
                    broadcast(("EST", r, payload))
                if len(tally) >= 2 * f + 1:
                    st.accepted.add(payload)
                    progress.set()
            elif tag == "AUX":
                assert payload in (0, 1)
                tally = st.voters["aux"][payload]
                if sender in tally:
                    continue
                tally.add(sender)
                progress.set()
            elif tag == "CONF":
                assert payload in _SUBSETS
                tally = st.subset_voters[payload]
                if sender in tally:
                    continue
                tally.add(sender)
                progress.set()

    ingest_task = asyncio.ensure_future(_ingest())
    ingest_task.add_done_callback(print_exception_callback)

    async def until(condition):
        while True:
            result = condition()
            if result is not None:
                return result
            progress.clear()
            await progress.wait()

    try:
        proposal = input_getter
        if callable(proposal):
            proposal = proposal()
        if asyncio.iscoroutine(proposal) or isinstance(proposal, asyncio.Future):
            proposal = await proposal
        assert proposal in (0, 1)
        estimate = proposal
        r = 0
        decided_bit = None
        while True:
            st = rounds[r]
            if not st.echoed[estimate]:
                st.echoed[estimate] = True
                broadcast(("EST", r, estimate))

            await until(lambda: True if st.accepted else None)
            broadcast(("AUX", r, next(iter(st.accepted))))

            def _aux_quorum():
                # n-f AUX votes, restricted to bits I have accepted.
                aux = st.voters["aux"]
                if 1 in st.accepted and len(aux[1]) >= n - f:
                    return {1}
                if 0 in st.accepted and len(aux[0]) >= n - f:
                    return {0}
                total = sum(len(aux[b]) for b in st.accepted)
                if total >= n - f and len(st.accepted) == 2:
                    return {0, 1}
                return None

            quorum = await until(_aux_quorum)
            subset = tuple(sorted(quorum))
            if not st.confed[subset]:
                st.confed[subset] = True
                broadcast(("CONF", r, subset))

            def _conf_quorum():
                if 1 in st.accepted and len(st.subset_voters[(1,)]) >= n - f:
                    return {1}
                if 0 in st.accepted and len(st.subset_voters[(0,)]) >= n - f:
                    return {0}
                total = 0
                union = set()
                for subset_, senders in st.subset_voters.items():
                    if set(subset_).issubset(st.accepted) and senders:
                        total += len(senders)
                        union.update(subset_)
                if total >= n - f:
                    return union
                return None

            quorum = await until(_conf_quorum)
            flip = await coin(r)
            if len(quorum) == 1:
                bit = next(iter(quorum))
                if bit == flip % 2:
                    if decided_bit is None:
                        decided_bit = bit
                        decide(bit)
                    elif decided_bit == bit:
                        raise AbandonedNodeError
                estimate = bit
            else:
                estimate = flip % 2
            r += 1
    finally:
        ingest_task.cancel()
