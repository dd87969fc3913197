"""Async per-party context and the real-socket communicator (mirrors
reference tests of ipc.py / ProcessProgramRunner)."""

import asyncio

import numpy as np
import pytest

from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.parallel.async_context import AsyncMpc, LocalPreproc
from honeybadgermpc_tpu.protocols.router import TestRouter
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements


def test_async_mpc_open_and_mul(rng):
    n, t = 4, 1
    pre = PreProcessedElements(n, t, seed=51)
    pre.generate_triples(64)
    xs = [rng.randrange(P) for _ in range(6)]
    ys = [rng.randrange(P) for _ in range(6)]
    x_sh = pre._share_values(FpArray.from_ints(xs))   # [n, 6]
    y_sh = pre._share_values(FpArray.from_ints(ys))

    # per-party triple slices must be consistent: deal once, slice per party
    pres = [LocalPreproc(PreProcessedElements(n, t, seed=52), i)
            for i in range(n)]
    for lp in pres:
        lp._pre.generate_triples(64)

    async def run():
        router = TestRouter(n, seed=19)
        results = []

        async def party(i):
            ctx = AsyncMpc("sid", n, t, i, router.sends[i], router.recvs[i],
                           preproc=pres[i])

            async def prog(c):
                sx = c.ShareArray(FpArray(x_sh.limbs[:, i]))
                sy = c.ShareArray(FpArray(y_sh.limbs[:, i]))
                opened = await (sx + sy).open()
                prod = await c.mul(sx, sy)
                prod_open = await prod.open()
                return opened.to_ints(), prod_open.to_ints()

            return await ctx._run(prog)

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 300)
        return outs

    outs = asyncio.run(run())
    want_sum = [(a + b) % P for a, b in zip(xs, ys)]
    want_prod = [a * b % P for a, b in zip(xs, ys)]
    for opened, prod in outs:
        assert list(opened) == want_sum
        assert list(prod) == want_prod


def test_async_mpc_error_party_excluded(rng):
    """A party sending corrupted R1/R2 columns is identified by the robust
    decode and permanently excluded from later opens (reference
    IncrementalDecoder confirmed-error tracking, reed_solomon.py:352-361)."""
    n, t = 4, 1
    byz = 2
    pre = PreProcessedElements(n, t, seed=61)
    xs = [rng.randrange(P) for _ in range(4)]
    x_sh = pre._share_values(FpArray.from_ints(xs))   # [n, 4]

    async def run():
        router = TestRouter(n, seed=23)
        ctxs = {}

        async def party(i):
            send = router.sends[i]
            if i == byz:
                inner = send

                def send(dest, o):                  # corrupt every column
                    shareid, round_, arr = o
                    inner(dest, (shareid, round_, arr ^ 1))
            ctx = AsyncMpc("sid2", n, t, i, send, router.recvs[i])
            ctxs[i] = ctx

            async def prog(c):
                sx = c.ShareArray(FpArray(x_sh.limbs[:, i]))
                a = await sx.open()
                b = await (sx + sx).open()
                return a.to_ints(), b.to_ints()

            return await ctx._run(prog)

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 600)
        return outs, ctxs

    outs, ctxs = asyncio.run(run())
    want1 = [v % P for v in xs]
    want2 = [2 * v % P for v in xs]
    for i, (a, b) in enumerate(outs):
        if i == byz:
            continue
        assert list(a) == want1 and list(b) == want2
        assert byz in ctxs[i]._error_parties


def test_async_mpc_config_faults_and_wb_decoder(rng):
    """ReconstructionConfig drives the runtime (reference mpc.py:126-131 +
    RobustDecoderFactory reed_solomon.py:545-558): party 0 is CONFIGURED
    faulty (induce_faults -> its outgoing R1/R2 shares are random garbage),
    honest parties are configured with the welch-berlekamp robust decoder.
    Opens must stay bit-exact, party 0 must be confirmed as an error party,
    and WB must be the robust decoder that actually ran (party 0 is inside
    the first k optimistic columns, so the fast path rejects and falls back)."""
    from honeybadgermpc_tpu.config import ReconstructionConfig

    n, t = 4, 1
    faulty = 0
    pre = PreProcessedElements(n, t, seed=71)
    xs = [rng.randrange(P) for _ in range(4)]
    x_sh = pre._share_values(FpArray.from_ints(xs))   # [n, 4]

    async def run():
        router = TestRouter(n, seed=29)
        ctxs = {}

        async def party(i):
            cfg = ReconstructionConfig(
                induce_faults=(i == faulty),
                decoding_algorithm="welch-berlekamp")
            ctx = AsyncMpc("sid3", n, t, i, router.sends[i],
                           router.recvs[i], config=cfg)
            ctxs[i] = ctx

            async def prog(c):
                sx = c.ShareArray(FpArray(x_sh.limbs[:, i]))
                a = await sx.open()
                b = await (sx + 1).open()
                return a.to_ints(), b.to_ints()

            return await ctx._run(prog)

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 600)
        return outs, ctxs

    outs, ctxs = asyncio.run(run())
    want1 = [v % P for v in xs]
    want2 = [(v + 1) % P for v in xs]
    wb_ran = 0
    for i, (a, b) in enumerate(outs):
        if i == faulty:
            continue
        assert list(a) == want1 and list(b) == want2
        assert faulty in ctxs[i]._error_parties
        wb_ran += ctxs[i].decode_stats["welch-berlekamp"]
        assert ctxs[i].decode_stats["gao"] == 0
    assert wb_ran > 0


def test_async_mpc_optimistic_fast_path(rng):
    """Fault-free opens take the optimistic decode+re-encode path and never
    invoke the robust decoder (reference IncrementalDecoder fast path,
    reed_solomon.py:305-332)."""
    n, t = 4, 1
    pre = PreProcessedElements(n, t, seed=81)
    xs = [rng.randrange(P) for _ in range(8)]
    x_sh = pre._share_values(FpArray.from_ints(xs))

    async def run():
        router = TestRouter(n, seed=31)
        ctxs = {}

        async def party(i):
            ctx = AsyncMpc("sid4", n, t, i, router.sends[i], router.recvs[i])
            ctxs[i] = ctx

            async def prog(c):
                sx = c.ShareArray(FpArray(x_sh.limbs[:, i]))
                return (await sx.open()).to_ints()

            return await ctx._run(prog)

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 300)
        return outs, ctxs

    outs, ctxs = asyncio.run(run())
    want = [v % P for v in xs]
    for i, a in enumerate(outs):
        assert list(a) == want
        assert ctxs[i].decode_stats["optimistic"] >= 1
        assert ctxs[i].decode_stats["gao"] == 0
        assert ctxs[i].decode_stats["welch-berlekamp"] == 0


def test_process_runner_real_sockets_config_faults(rng):
    """The VERDICT done-criterion run: 4 parties over REAL TCP sockets
    (ProcessProgramRunner), each loading its conf/mpc_with_faults/ config —
    party 0 is configured faulty (induce_faults) and every party uses the
    welch-berlekamp robust decoder. Opens stay bit-exact on honest
    parties, party 0 is confirmed as an error party, and WB actually ran
    (reference conf/mpc_with_faults + mpc.py:126-131)."""
    import json
    import os

    import zmq  # noqa: F401  (skip if missing)

    from honeybadgermpc_tpu.config import ReconstructionConfig
    from honeybadgermpc_tpu.parallel.async_context import LocalPreproc
    from honeybadgermpc_tpu.parallel.ipc import ProcessProgramRunner

    n, t = 4, 1
    conf_dir = os.path.join(os.path.dirname(__file__), "..",
                            "conf", "mpc_with_faults")
    confs = []
    for i in range(n):
        with open(os.path.join(conf_dir, f"local.{i}.json")) as f:
            confs.append(json.load(f))
    assert confs[0]["reconstruction"]["induce_faults"] is True
    # test ports, not the conf ones (avoid collisions across test runs)
    base = 17790
    peers = {i: ("127.0.0.1", base + i) for i in range(n)}

    pre = PreProcessedElements(n, t, seed=91)
    xs = [rng.randrange(P) for _ in range(4)]
    x_sh = pre._share_values(FpArray.from_ints(xs))

    async def run():
        ctxs = {}

        async def party(i):
            cfg = ReconstructionConfig.from_dict(confs[i]["reconstruction"])
            async with ProcessProgramRunner(peers, n, t, i) as runner:

                async def prog(c):
                    ctxs[i] = c
                    sx = c.ShareArray(FpArray(x_sh.limbs[:, i]))
                    # several sequential opens: whether the faulty column
                    # lands inside a given gather's first n-t arrivals is
                    # timing-dependent over real sockets, but across 4
                    # opens x 2 rounds x 3 honest parties the faulty party
                    # is detected with overwhelming probability
                    outs = [await (sx + j).open() for j in range(4)]
                    return [o.to_ints() for o in outs]

                return await runner.execute(
                    "mpc-faults", prog, config=cfg,
                    preproc=LocalPreproc(pre, i))

        return await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 600), ctxs

    outs, ctxs = asyncio.run(run())
    wb_ran = 0
    detected = 0
    for i, got in enumerate(outs):
        if i == 0:
            continue
        for j in range(4):
            assert list(got[j]) == [(v + j) % P for v in xs], f"party {i}"
        detected += 0 in ctxs[i]._error_parties
        wb_ran += ctxs[i].decode_stats["welch-berlekamp"]
        assert ctxs[i].decode_stats["gao"] == 0
    assert detected > 0 and wb_ran > 0


def test_node_communicator_localhost():
    """n NodeCommunicators over real TCP sockets in one loop."""
    import zmq  # noqa: F401  (skip if missing)
    from honeybadgermpc_tpu.parallel.ipc import (NodeCommunicator,
                                                 verify_all_connections)
    n = 3
    base = 17710
    peers = {i: ("127.0.0.1", base + i) for i in range(n)}

    async def run():
        comms = [NodeCommunicator(peers, i) for i in range(n)]
        for c in comms:
            await c._setup()

        # handshake everyone BEFORE any data flows: this test reads the raw
        # channel, so interleaved PING/DATA would be lost (real programs
        # layer subscribe_recv tag demux on top)
        await asyncio.gather(*[
            verify_all_connections(comms[i].send, comms[i].recv, n, i)
            for i in range(n)])

        async def party(i):
            c = comms[i]
            for j in range(n):
                c.send(j, ("DATA", i * 100 + j))
            got = {}
            while len(got) < n:
                sender, msg = await c.recv()
                if msg[0] == "DATA":
                    got[sender] = msg[1]
            return got

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 60)
        for c in comms:
            await c.close()
        return outs

    outs = asyncio.run(run())
    for j, got in enumerate(outs):
        for i in range(n):
            assert got[i] == i * 100 + j
