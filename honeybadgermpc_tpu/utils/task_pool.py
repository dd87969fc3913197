"""Bounded asyncio worker pool (reference utils/task_pool.py:1-31)."""

from __future__ import annotations

import asyncio


class TaskPool:
    def __init__(self, max_tasks: int):
        self._sem = asyncio.Semaphore(max_tasks)
        self._tasks: list = []

    def submit(self, coro):
        async def _run():
            async with self._sem:
                return await coro
        task = asyncio.ensure_future(_run())
        self._tasks.append(task)
        return task

    async def close(self):
        await asyncio.gather(*self._tasks)
