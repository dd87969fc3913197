"""Asynchronous Verifiable Information Dispersal (reference
broadcast/avid.py:29-285): the leader disperses N payloads so that each can
be retrieved individually later; ECHO/READY agreement on the Merkle roots
guarantees retrievability once OK'd; retrieval collects k Merkle-verified
stripes (t+1 RESPONSEs, avid.py:67-121)."""

from __future__ import annotations

import asyncio
from collections import defaultdict

from ..utils.misc import print_exception_callback
from . import erasure
from .merkle import merkle_branch, merkle_root, merkle_tree, merkle_verify


class AVID:
    def __init__(self, n, f, leader, recv, send, input_size):
        self.n, self.f, self.leader = n, f, leader
        self.recv, self.send = recv, send
        self.input_size = input_size
        self.k = n - 2 * f
        self.echo_threshold = n - f
        self.ready_threshold = f + 1
        self.output_threshold = 2 * f + 1
        self.ok_future = asyncio.Future()
        self._my_stripes = [None] * input_size
        self._my_branches = [None] * input_size
        self._roots = None
        self._retrieve_queues = defaultdict(asyncio.Queue)
        self._pending_requests = []
        self._serve_task = None

    def _broadcast(self, o):
        for dest in range(self.n):
            self.send(dest, o)

    def _answer(self, sender, idx):
        if self._roots is not None and self._my_stripes[idx] is not None:
            self.send(sender, ("RESPONSE", idx, self._my_stripes[idx],
                               self._my_branches[idx]))

    async def disperse(self, sid, pid, inputs=None, client_mode=False):
        """Run dispersal; leader supplies `inputs` (list of bytes). Keeps a
        background task serving retrieval requests afterwards."""
        if pid == self.leader and inputs is not None:
            assert len(inputs) == self.input_size
            all_stripes, trees = [], []
            for m in inputs:
                if isinstance(m, str):
                    m = m.encode()
                stripes = [erasure.serialize_stripe(s)
                           for s in erasure.encode(self.k, self.n, m)]
                all_stripes.append(stripes)
                trees.append(merkle_tree(stripes))
            roots = [merkle_root(t) for t in trees]
            for dest in range(self.n):
                payload = [(all_stripes[m_][dest],
                            merkle_branch(trees[m_], dest))
                           for m_ in range(self.input_size)]
                self.send(dest, ("VAL", roots, payload))
            if client_mode:
                return

        echo_store = {}
        ready_senders = set()
        ready_sent = False
        ready_counter = defaultdict(set)

        while True:
            sender, msg = await self.recv()
            if msg[0] == "VAL":
                _, roots, payload = msg
                if sender != self.leader or self._roots is not None:
                    continue
                if not all(merkle_verify(self.n, stripe, roots[m_], branch, pid)
                           for m_, (stripe, branch) in enumerate(payload)):
                    continue
                self._roots = roots
                self._my_stripes = [s for s, _ in payload]
                self._my_branches = [b for _, b in payload]
                for s_, i_ in self._pending_requests:
                    self._answer(s_, i_)
                self._broadcast(("ECHO", tuple(roots)))
            elif msg[0] == "ECHO":
                _, roots = msg
                if sender in echo_store:
                    continue
                echo_store[sender] = roots
                cnt = sum(1 for r in echo_store.values() if r == roots)
                if cnt >= self.echo_threshold and not ready_sent:
                    ready_sent = True
                    self._broadcast(("READY", roots))
            elif msg[0] == "READY":
                _, roots = msg
                if sender in ready_senders:
                    continue
                ready_senders.add(sender)
                ready_counter[roots].add(sender)
                cnt = len(ready_counter[roots])
                if cnt >= self.ready_threshold and not ready_sent:
                    ready_sent = True
                    self._broadcast(("READY", roots))
                if cnt >= self.output_threshold:
                    if self._roots is None:
                        self._roots = list(roots)
                    if not self.ok_future.done():
                        self.ok_future.set_result(True)
                    self._serve_task = asyncio.ensure_future(self._serve())
                    self._serve_task.add_done_callback(print_exception_callback)
                    return
            elif msg[0] == "REQUEST":
                self._pending_requests.append((sender, msg[1]))
                self._answer(sender, msg[1])
            elif msg[0] == "RESPONSE":
                self._retrieve_queues[msg[1]].put_nowait((sender, msg))

    async def _serve(self):
        while True:
            sender, msg = await self.recv()
            if msg[0] == "REQUEST":
                self._answer(sender, msg[1])
            elif msg[0] == "RESPONSE":
                self._retrieve_queues[msg[1]].put_nowait((sender, msg))

    async def retrieve(self, sid, index: int):
        """Collect k Merkle-verified stripes for payload `index`, decode,
        and validate by re-encoding against the agreed root."""
        await self.ok_future
        root = self._roots[index]
        self._broadcast(("REQUEST", index))
        stripes = [None] * self.n
        got = 0
        q = self._retrieve_queues[index]
        while got < self.k:
            sender, msg = await q.get()
            _, idx, stripe, branch = msg
            if idx != index or stripes[sender] is not None:
                continue
            if not merkle_verify(self.n, stripe, root, branch, sender):
                continue
            stripes[sender] = stripe
            got += 1
        raw = [erasure.deserialize_stripe(s) if s is not None else None
               for s in stripes]
        m = erasure.decode(self.k, self.n, raw)
        restripes = [erasure.serialize_stripe(s)
                     for s in erasure.encode(self.k, self.n, m)]
        return m if merkle_root(merkle_tree(restripes)) == root else None

    def kill(self):
        if self._serve_task is not None:
            self._serve_task.cancel()
