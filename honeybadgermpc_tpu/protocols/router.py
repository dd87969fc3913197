"""In-process n-party network (reference router.py:9-107, test delay router
tests/fixtures.py:116-141).

The asynchronous consensus substrate (RBC/ABA/ACS/AVSS) is genuinely
control-flow-asynchronous, so it keeps the reference's host-side
send/recv contract: ``send(dest, obj)`` / ``await recv() -> (sender, obj)``.
The TPU device mesh carries the throughput path (parallel/mesh.py); these
routers carry the control plane and tests.
"""

from __future__ import annotations

import asyncio
import random
from typing import Callable


class Router:
    """Base: wires n parties' sends/recvs/broadcasts together."""

    def __init__(self, num_parties: int):
        self.num_parties = num_parties
        self.queues = [asyncio.Queue() for _ in range(num_parties)]
        self.sends = [self._make_send(i) for i in range(num_parties)]
        self.recvs = [self._make_recv(i) for i in range(num_parties)]
        self.broadcasts = [self._make_broadcast(i) for i in range(num_parties)]

    def _make_send(self, party_id: int) -> Callable:
        raise NotImplementedError

    def _make_recv(self, party_id: int):
        async def recv():
            return await self.queues[party_id].get()
        return recv

    def _make_broadcast(self, party_id: int):
        def broadcast(o):
            for dest in range(self.num_parties):
                self.sends[party_id](dest, o)
        return broadcast


class SimpleRouter(Router):
    """Immediate delivery via asyncio queues (router.py:66-107)."""

    def _make_send(self, party_id: int):
        def send(dest, o):
            self.queues[dest].put_nowait((party_id, o))
        return send


class TestRouter(Router):
    """Uniform random per-message delay <= max_delay (default 5 ms), the
    load-bearing async-network simulation of the reference test suite
    (tests/fixtures.py:116-129)."""

    def __init__(self, num_parties: int, max_delay: float = 0.005, seed=None):
        self.rng = random.Random(seed)
        self.max_delay = max_delay
        super().__init__(num_parties)

    def _make_send(self, party_id: int):
        def send(dest, o):
            delay = self.rng.random() * self.max_delay
            asyncio.get_event_loop().call_later(
                delay, self.queues[dest].put_nowait, (party_id, o))
        return send


class ByzantineRouter(TestRouter):
    """Wraps TestRouter with per-message mutation hooks for byzantine
    nodes (tests/test_binaryagreement.py:12-53 pattern)."""

    def __init__(self, num_parties, byznodes=(), mutate=None, **kw):
        self.byznodes = set(byznodes)
        self.mutate = mutate or (lambda sender, dest, o: o)
        super().__init__(num_parties, **kw)

    def _make_send(self, party_id: int):
        def send(dest, o):
            if party_id in self.byznodes:
                o = self.mutate(party_id, dest, o)
                if o is None:
                    return
            delay = self.rng.random() * self.max_delay
            asyncio.get_event_loop().call_later(
                delay, self.queues[dest].put_nowait, (party_id, o))
        return send
