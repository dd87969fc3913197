"""Tag multiplexing and small helpers (reference utils/misc.py).

``wrap_send``/``subscribe_recv`` let thousands of protocol instances share
one link by message tag — the reference's core multiplexing mechanism
(utils/misc.py:21-106)."""

from __future__ import annotations

import asyncio
import logging
from collections import defaultdict


def print_exception_callback(future):
    if future.done() and not future.cancelled():
        ex = future.exception()
        if ex is not None:
            logging.critical("Task exception: %r", ex, exc_info=ex)
            raise ex


def wrap_send(tag, send):
    """send' such that send'(dest, msg) => send(dest, (tag, msg))."""
    def _send(dest, message):
        send(dest, (tag, message))
    return _send


def subscribe_recv(recv):
    """Background demux of (sender, (tag, msg)) into per-tag queues.
    Returns (task, subscribe) — cancel the task to stop. Each tag may be
    subscribed once (utils/misc.py:99)."""
    tag_table: dict = defaultdict(asyncio.Queue)
    taken = set()

    async def _recv_loop():
        while True:
            sender, (tag, o) = await recv()
            tag_table[tag].put_nowait((sender, o))

    def subscribe(tag):
        assert tag not in taken, f"tag {tag} already subscribed"
        taken.add(tag)
        q = tag_table[tag]

        async def recv_tag():
            return await q.get()
        return recv_tag

    task = asyncio.ensure_future(_recv_loop())
    task.add_done_callback(_swallow_cancel)
    return task, subscribe


def _swallow_cancel(future):
    try:
        future.exception()
    except (asyncio.CancelledError, Exception):
        pass


def chunk_data(data, chunk_size):
    """Split into chunks of chunk_size, last one padded by repetition of
    None? No — exact chunks; caller pads (utils/misc.py:33)."""
    res = [list(data[i:i + chunk_size]) for i in range(0, len(data), chunk_size)]
    return res


def flatten_lists(lists):
    return [x for sub in lists for x in sub]


def transpose_lists(lists):
    return [list(row) for row in zip(*lists)]
