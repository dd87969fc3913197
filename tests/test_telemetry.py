"""Telemetry: structured phase log + byte counters (mirrors the reference's
benchmark_logger, logging.yaml:12-24, and NodeCommunicator byte accounting,
ipc.py:27-29,112)."""

import json

from honeybadgermpc_tpu.utils.telemetry import (BenchmarkLogger, ByteCounter,
                                                phase)


def test_benchmark_logger_file(tmp_path):
    path = tmp_path / "bench.jsonl"
    log = BenchmarkLogger(3, path=str(path))
    log.record("deal", batch=64)
    with phase(log, "open.encode_send", shareid=0):
        pass
    log.close()
    recs = [json.loads(line) for line in path.read_text().splitlines()]
    assert len(recs) == 2
    assert recs[0]["node"] == 3 and recs[0]["phase"] == "deal"
    assert recs[0]["batch"] == 64
    assert recs[1]["phase"] == "open.encode_send"
    assert recs[1]["elapsed_s"] >= 0


def test_benchmark_logger_stdlib(caplog):
    import logging

    log = BenchmarkLogger(0)
    with caplog.at_level(logging.INFO, "honeybadgermpc_tpu.benchmark"):
        log.record("x", k=1)
    assert any('"phase": "x"' in r.message for r in caplog.records)


def test_byte_counter():
    c = ByteCounter()
    c.add(1, 100)
    c.add(1, 50)
    c.add(2, 7)
    assert c.total_bytes == 157
    assert c.total_msgs == 3
    assert c.summary()["per_dest"] == {1: 150, 2: 7}
