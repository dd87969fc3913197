"""AVSS-based robust preprocessing (reference offline_robust.py:24-242).

The asynchronously-secure offline path: every party continuously AVSSes
batches of random values; AvssValueProcessor agrees on which dealings are
common; RandomGenerator extracts unbiased randomness from the agreed
values (hyperinvertible refinement); TripleGenerator chunks agreed values
as (a, b, ab) triples (dealer-trusted, as in the reference :184-202 which
notes no triple verification is wired in).
"""

from __future__ import annotations

import asyncio
import pickle

from ..field import GF
from ..elliptic_curve import Subgroup
from ..polynomial import polynomials_over
from ..utils.misc import print_exception_callback, subscribe_recv, wrap_send
from .preprocessing import PreProcessedElements  # noqa: F401 (API surface)
from .refinement import refine_randoms_host
from ..protocols.avss_value_processor import AvssValueProcessor
from ..protocols.hbavss import HbAvssLight, get_avss_params


class PreProcessingBase:
    """Watermark-triggered AVSS refill loop (offline_robust.py:24-139)."""

    def __init__(self, n, t, my_id, send, recv, tag, batch_size=4,
                 avss_value_processor_chunk_size=1, pk=None, sk=None,
                 low_watermark=None, period=0.05):
        self.n, self.t, self.my_id = n, t, my_id
        self.tag = tag
        self.batch_size = batch_size
        # refill threshold + poll period of the continuous runner
        # (reference offline_robust.py:46-47 low_watermark = batch_size,
        # PERIOD_IN_SECONDS poll loop :87-99)
        self.low_watermark = (batch_size if low_watermark is None
                              else low_watermark)
        self.period = period
        self.output_queue = asyncio.Queue()
        self.field = GF(Subgroup.BLS12_381)
        self.poly = polynomials_over(self.field)
        self._tasks = []
        self._coin_keys = (pk, sk)

        self._recv_task, self._subscribe = subscribe_recv(recv)
        self.send = send
        self.get_send = lambda tag_: wrap_send(tag_, send)
        self.get_recv = lambda tag_: self._subscribe(tag_)

        g, h, pks, sks = get_avss_params(n, t)
        self.avss = HbAvssLight(
            pks, sks[my_id], g, h, n, t, my_id,
            self.get_send(f"{tag}-AVSS"), self.get_recv(f"{tag}-AVSS"))
        self._avss_input_q = asyncio.Queue()
        self.avp = AvssValueProcessor(
            pk, sk, n, t, my_id,
            self.get_send(f"{tag}-AVP"), self.get_recv(f"{tag}-AVP"),
            self._avss_input_q.get, acs_period=0.2)

    async def _trigger_and_wait_for_avss(self, avss_id: int):
        """Every party deals batch_size values; collect own shares of all
        dealings (offline_robust.py:65-85)."""
        import random as _r
        values = [_r.randrange(self.field.modulus)
                  for _ in range(self.batch_size)]

        async def deal(dealer):
            shares = await self.avss.avss_parallel(
                (self.tag, avss_id), self.batch_size,
                values if dealer == self.my_id else None, dealer)
            for i, s in enumerate(shares):
                self._avss_input_q.put_nowait(
                    (dealer, avss_id * self.batch_size + i, s))

        await asyncio.gather(*[deal(d) for d in range(self.n)])

    async def _runner(self, n_batches: int):
        self.avp.start()
        for b in range(n_batches):
            await self._trigger_and_wait_for_avss(b)
            await self.avp.run_acs_round()
            await self._extract()

    async def _watermark_runner(self):
        """Continuous refill (reference offline_robust.py:87-99): whenever
        the output queue drops below low_watermark, deal another batch of
        AVSSes; otherwise poll every ``period`` seconds. Runs until
        kill() — a long-running online phase keeps draining the queue and
        the generators keep it topped up."""
        self.avp.start()
        b = 0
        while True:
            if self.output_queue.qsize() < self.low_watermark:
                await self._trigger_and_wait_for_avss(b)
                await self.avp.run_acs_round()
                await self._extract()
                b += 1
            await asyncio.sleep(self.period)

    def start(self, n_batches: int | None = None):
        """n_batches=None (default): continuous watermark-triggered refill,
        the reference's production mode. An explicit count runs exactly
        that many batches (tests/benchmarks)."""
        coro = (self._watermark_runner() if n_batches is None
                else self._runner(n_batches))
        t = asyncio.ensure_future(coro)
        t.add_done_callback(print_exception_callback)
        self._tasks.append(t)
        return t

    def kill(self):
        self.avss.kill()
        self.avp.kill()
        self._recv_task.cancel()
        for t in self._tasks:
            t.cancel()

    async def _extract(self):
        raise NotImplementedError

    async def _collect_agreed_batch(self):
        """Drain one round's agreed outputs: list of (dealer, share)."""
        out = []
        while not self.avp.output_queue.empty():
            dealer, fut = self.avp.output_queue.get_nowait()
            out.append((dealer, await fut))
        return out


class RandomGenerator(PreProcessingBase):
    """Unbiased randomness from agreed AVSS values via hyperinvertible
    refinement (offline_robust.py:149-167)."""

    def __init__(self, n, t, my_id, send, recv, pk=None, sk=None,
                 batch_size=4):
        super().__init__(n, t, my_id, send, recv, "rand",
                         batch_size=batch_size, pk=pk, sk=sk)

    async def _extract(self):
        batch = await self._collect_agreed_batch()
        if len(batch) < self.n - self.t:
            return
        shares = [s for _, s in batch]
        refined = refine_randoms_host(self.n, self.t, self.field, shares)
        for r in refined:
            self.output_queue.put_nowait(r)

    async def get(self):
        return await self.output_queue.get()


class TripleGenerator(PreProcessingBase):
    """Dealer-supplied Beaver triples over AVSS (offline_robust.py:170-202;
    like the reference, dealer honesty for the triple relation is assumed —
    chunk_size=3)."""

    def __init__(self, n, t, my_id, send, recv, pk=None, sk=None,
                 batch_size=6):
        assert batch_size % 3 == 0
        super().__init__(n, t, my_id, send, recv, "triple",
                         batch_size=batch_size, pk=pk, sk=sk)

    async def _trigger_and_wait_for_avss(self, avss_id: int):
        import random as _r
        triples = []
        for _ in range(self.batch_size // 3):
            a = _r.randrange(self.field.modulus)
            b = _r.randrange(self.field.modulus)
            triples += [a, b, a * b % self.field.modulus]

        async def deal(dealer):
            shares = await self.avss.avss_parallel(
                (self.tag, avss_id), self.batch_size,
                triples if dealer == self.my_id else None, dealer)
            for i, s in enumerate(shares):
                self._avss_input_q.put_nowait(
                    (dealer, avss_id * self.batch_size + i, s))

        await asyncio.gather(*[deal(d) for d in range(self.n)])

    async def _extract(self):
        batch = await self._collect_agreed_batch()
        per_dealer = {}
        for dealer, share in batch:
            per_dealer.setdefault(dealer, []).append(share)
        for dealer, shares in per_dealer.items():
            for i in range(0, len(shares) - 2, 3):
                self.output_queue.put_nowait(tuple(shares[i:i + 3]))

    async def get(self):
        return await self.output_queue.get()
