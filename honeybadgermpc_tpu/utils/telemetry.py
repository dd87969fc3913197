"""Structured per-party observability.

The reference stamps protocol phases through a dedicated ``benchmark_logger``
(LoggerAdapter carrying node_id, wired to /var/log/hbmpc/benchmark.log by
honeybadgermpc/logging.yaml:12-24) and counts bytes per link in
NodeCommunicator (ipc.py:27-29,112,66); call sites bracket send/reconstruct
phases (batch_reconstruction.py:119-121,170,188,199,217,
apps/asynchromix/powermixing.py:23-45).

TPU-native equivalents here:

- ``BenchmarkLogger(node_id)``: structured JSON-lines phase log. Every
  record carries node_id, monotonic timestamp, phase name, elapsed seconds
  and free-form fields. Destination is ``HBMPC_BENCH_LOG`` (path) or the
  ``honeybadgermpc_tpu.benchmark`` stdlib logger.
- ``phase(logger, name, **fields)``: context manager stamping one record.
- ``device_trace(path)``: wraps ``jax.profiler.trace`` — the xprof trace is
  the TPU answer to the reference's per-call NTL timers (kernel time lives
  on-device, host timers around jitted calls only see dispatch).
- ``ByteCounter``: per-link byte/message accounting; NodeCommunicator
  updates it per send (same contract as the reference's bytes_sent).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from collections import defaultdict

_BENCH_LOGGER_NAME = "honeybadgermpc_tpu.benchmark"


class BenchmarkLogger:
    """JSON-lines phase logger bound to one party (node_id)."""

    def __init__(self, node_id, path: str | None = None):
        self.node_id = node_id
        self._path = path or os.environ.get("HBMPC_BENCH_LOG")
        self._fh = open(self._path, "a") if self._path else None
        self._log = logging.getLogger(_BENCH_LOGGER_NAME)

    def record(self, phase: str, elapsed: float | None = None, **fields):
        rec = {"node": self.node_id, "ts": time.time(), "phase": phase}
        if elapsed is not None:
            rec["elapsed_s"] = round(elapsed, 6)
        rec.update(fields)
        line = json.dumps(rec, default=str)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            self._log.info("%s", line)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def phase(logger: BenchmarkLogger, name: str, **fields):
    """Bracket a protocol phase; stamps one record with elapsed wall time.

    Mirrors the reference's paired benchmark_logger.info calls around
    send/reconstruct phases (batch_reconstruction.py:170,188)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.record(name, elapsed=time.perf_counter() - t0, **fields)


@contextlib.contextmanager
def device_trace(path: str):
    """jax.profiler trace context (xprof). On-device kernel timings —
    host-side timers only see dispatch on an async backend."""
    import jax

    with jax.profiler.trace(path):
        yield


class ByteCounter:
    """Per-destination byte/message counters (reference ipc.py:27-29)."""

    def __init__(self):
        self.bytes_to = defaultdict(int)
        self.msgs_to = defaultdict(int)

    def add(self, dest, nbytes: int):
        self.bytes_to[dest] += nbytes
        self.msgs_to[dest] += 1

    @property
    def total_bytes(self) -> int:
        return sum(self.bytes_to.values())

    @property
    def total_msgs(self) -> int:
        return sum(self.msgs_to.values())

    def summary(self) -> dict:
        return {"total_bytes": self.total_bytes,
                "total_msgs": self.total_msgs,
                "per_dest": dict(self.bytes_to)}
