"""Heap-based in-order delivery of (seq, value) pairs (reference
utils/sequencer.py:4-48)."""

from __future__ import annotations

import heapq


class Sequencer:
    def __init__(self):
        self._heap: list = []
        self._next = 0
        self._seen = set()

    def add(self, item):
        seq, _ = item
        assert seq >= self._next and seq not in self._seen, seq
        self._seen.add(seq)
        heapq.heappush(self._heap, item)

    def is_next_available(self) -> bool:
        return bool(self._heap) and self._heap[0][0] == self._next

    def get(self):
        assert self.is_next_available()
        self._next += 1
        return heapq.heappop(self._heap)
