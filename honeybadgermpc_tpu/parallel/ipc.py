"""Real multi-process network backend (reference ipc.py:19-232).

``NodeCommunicator``: one ZMQ ROUTER socket bound at our own port (server)
plus a DEALER per peer (client, identity = our id), pickle payloads,
per-peer async send queues with a self-loop shortcut, byte accounting
reported at teardown — the reference's architecture (:38-114) on the same
library.

``ProcessProgramRunner``: NodeCommunicator + tag multiplexing + the async
MPC context (:117-170). Each OS process is one party; device kernels run
the local math while the opens await network exchanges.
"""

from __future__ import annotations

import asyncio
import logging
import pickle
from collections import defaultdict

import zmq
import zmq.asyncio

from ..utils.misc import print_exception_callback, subscribe_recv, wrap_send


class NodeCommunicator:
    def __init__(self, peers_config: dict, my_id: int, linger_timeout: int = 2):
        """peers_config: {party_id: (ip, port)}."""
        self.peers_config = peers_config
        self.my_id = my_id
        self.n = len(peers_config)
        from ..utils.telemetry import ByteCounter
        self.byte_counter = ByteCounter()       # per-link accounting
        self._receiver_queue = asyncio.Queue()
        self._send_queues = {}
        self._tasks = []
        self._ctx = zmq.asyncio.Context()
        self._linger = linger_timeout

    async def __aenter__(self):
        await self._setup()
        return self

    async def __aexit__(self, *exc):
        await self.close()

    async def _setup(self):
        ip, port = self.peers_config[self.my_id]
        self._router = self._ctx.socket(zmq.ROUTER)
        self._router.bind(f"tcp://*:{port}")
        task = asyncio.ensure_future(self._recv_loop())
        task.add_done_callback(print_exception_callback)
        self._tasks.append(task)

        self._dealers = {}
        for pid, (pip, pport) in self.peers_config.items():
            if pid == self.my_id:
                continue
            d = self._ctx.socket(zmq.DEALER)
            # identity = sender id (noted insecure in the reference too,
            # ipc.py:83-84 — authentication is out of scope of this layer)
            d.setsockopt(zmq.IDENTITY, str(self.my_id).encode())
            d.connect(f"tcp://{pip}:{pport}")
            self._dealers[pid] = d
            q = asyncio.Queue()
            self._send_queues[pid] = q
            t = asyncio.ensure_future(self._send_loop(pid, q))
            t.add_done_callback(print_exception_callback)
            self._tasks.append(t)

    async def _recv_loop(self):
        while True:
            ident, raw = await self._router.recv_multipart()
            sender = int(ident.decode())
            self._receiver_queue.put_nowait((sender, pickle.loads(raw)))

    async def _send_loop(self, pid, q):
        d = self._dealers[pid]
        while True:
            raw = await q.get()
            await d.send(raw)

    def send(self, dest: int, obj):
        if dest == self.my_id:
            # self-loop shortcut (ipc.py:40-46)
            self._receiver_queue.put_nowait((self.my_id, obj))
            return
        raw = pickle.dumps(obj)
        self.byte_counter.add(dest, len(raw))
        self._send_queues[dest].put_nowait(raw)

    @property
    def bytes_sent(self) -> int:
        return self.byte_counter.total_bytes

    async def recv(self):
        return await self._receiver_queue.get()

    async def close(self):
        logging.info("[%d] bytes sent: %d", self.my_id, self.bytes_sent)
        logging.info("[%d] per-link: %s", self.my_id,
                     self.byte_counter.summary()["per_dest"])
        for t in self._tasks:
            t.cancel()
        for d in self._dealers.values():
            d.close(self._linger)
        self._router.close(self._linger)
        self._ctx.term()


async def verify_all_connections(send, recv, n, my_id):
    """Handshake until every peer answered (ipc.py:173-195)."""
    for dest in range(n):
        send(dest, ("PING", my_id))
    seen = set()
    while len(seen) < n:
        sender, msg = await recv()
        if msg[0] == "PING":
            send(sender, ("PONG", my_id))
        elif msg[0] == "PONG":
            seen.add(sender)


class ProcessProgramRunner:
    """One party per OS process over real sockets (ipc.py:117-170)."""

    def __init__(self, peers_config, n, t, my_id, mixins=None):
        self.n, self.t, self.my_id = n, t, my_id
        self.communicator = NodeCommunicator(peers_config, my_id)
        self.mixins = mixins or {}
        self._program_tasks = []

    async def __aenter__(self):
        await self.communicator._setup()
        self._recv_task, self._subscribe = subscribe_recv(
            self.communicator.recv)
        self.get_send = lambda tag: wrap_send(tag, self.communicator.send)
        self.get_recv = self._subscribe
        hs_send = self.get_send("HANDSHAKE")
        await verify_all_connections(
            hs_send, self.get_recv("HANDSHAKE"), self.n, self.my_id)
        return self

    async def __aexit__(self, *exc):
        for t in self._program_tasks:
            if not t.done():
                await t
        self._recv_task.cancel()
        await self.communicator.close()

    def execute(self, sid: str, program, **kwargs):
        """Run an async MPC program with a tagged channel
        (ipc.py:129-151). program(ctx) where ctx is an AsyncMpc."""
        from .async_context import AsyncMpc
        send, recv = self.get_send(sid), self.get_recv(sid)
        ctx = AsyncMpc(sid, self.n, self.t, self.my_id, send, recv,
                       mixins=self.mixins, **kwargs)
        task = asyncio.ensure_future(ctx._run(program))
        task.add_done_callback(print_exception_callback)
        self._program_tasks.append(task)
        return task
