"""Agreement on which AVSSed values are common (reference
avss_value_processor.py:11-262).

Parties locally accumulate AVSS outputs per dealer at different speeds; a
periodic ACS on the per-dealer receive-count vectors picks, for each
dealer, the (n-(t+1))-th largest count — a batch size at least t+1 honest
parties already hold, hence eventually available to everyone. Values are
emitted in agreed order, round-robin across dealers (:146-223), with
per-dealer Sequencer ordering (:37,81-96).
"""

from __future__ import annotations

import asyncio
import pickle

from ..utils.misc import print_exception_callback, subscribe_recv, wrap_send
from ..utils.sequencer import Sequencer
from .commonsubset import run_common_subset


class AvssValueProcessor:
    def __init__(self, pk, sk, n, t, my_id, send, recv, get_input,
                 acs_period: float = 1.0):
        """get_input: async () -> (dealer_id, avss_seq, value) as local AVSS
        instances complete (the reference's input queue)."""
        self.pk, self.sk = pk, sk
        self.n, self.t, self.my_id = n, t, my_id
        self.send, self.recv = send, recv
        self.get_input = get_input
        self.acs_period = acs_period
        self.inputs_per_dealer = [[] for _ in range(n)]
        self.sequencers = [Sequencer() for _ in range(n)]
        self.outputs_per_dealer = [[] for _ in range(n)]
        self.output_queue = asyncio.Queue()
        # agreed-but-not-yet-received slots, resolved event-driven from
        # _input_loop (reference chains futures, avss_value_processor.py:
        # 158-164 — no polling)
        self._pending: list[dict[int, asyncio.Future]] = [
            {} for _ in range(n)]
        self._emitted = [0 for _ in range(n)]
        self._rr_dealer = 0
        self._acs_round = 0
        self._recv_task, self._subscribe = subscribe_recv(recv)
        self._tasks = []

    def start(self):
        for coro in (self._input_loop(), self._acs_loop()):
            t = asyncio.ensure_future(coro)
            t.add_done_callback(print_exception_callback)
            self._tasks.append(t)
        return self

    def kill(self):
        self._recv_task.cancel()
        for t in self._tasks:
            t.cancel()

    async def _input_loop(self):
        while True:
            dealer_id, seq, value = await self.get_input()
            self.sequencers[dealer_id].add((seq, value))
            while self.sequencers[dealer_id].is_next_available():
                _, v = self.sequencers[dealer_id].get()
                k = len(self.inputs_per_dealer[dealer_id])
                self.inputs_per_dealer[dealer_id].append(v)
                fut = self._pending[dealer_id].pop(k, None)
                if fut is not None and not fut.done():
                    fut.set_result(v)

    async def _acs_loop(self):
        while True:
            await asyncio.sleep(self.acs_period)
            await self.run_acs_round()

    async def run_acs_round(self):
        """One agreement round: propose local counts, agree, emit."""
        r = self._acs_round
        self._acs_round += 1
        counts = [len(self.inputs_per_dealer[j]) for j in range(self.n)]
        acs_send = wrap_send(f"AVP-ACS{r}", self.send)
        acs_recv = self._subscribe(f"AVP-ACS{r}")
        outs = await run_common_subset(
            f"AVP{r}", self.my_id, self.n, self.t, (self.pk, self.sk),
            pickle.dumps(counts), acs_send, acs_recv)
        vectors = [pickle.loads(o) for o in outs if o is not None]
        agreed = []
        for j in range(self.n):
            per_dealer = sorted(v[j] for v in vectors)
            # (n - (t+1))-th order statistic among the >= n-t proposals
            idx = len(per_dealer) - (self.t + 1)
            agreed.append(per_dealer[idx] if idx >= 0 else 0)
        await self._emit(agreed)
        return agreed

    async def _emit(self, agreed_counts):
        """Emit futures for every newly-agreed slot, round-robin by dealer
        (reference output ordering :168-223)."""
        for j in range(self.n):
            while self._emitted[j] < agreed_counts[j]:
                k = self._emitted[j]
                self._emitted[j] += 1
                fut = asyncio.Future()
                if k < len(self.inputs_per_dealer[j]):
                    fut.set_result(self.inputs_per_dealer[j][k])
                else:
                    # not yet locally available: _input_loop resolves it on
                    # arrival (event-driven, no polling)
                    self._pending[j][k] = fut
                self.outputs_per_dealer[j].append(fut)
                self.output_queue.put_nowait((j, fut))
