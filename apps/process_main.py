"""Per-process party entry point (reference `python -m honeybadgermpc.ipc
-d -f conf/mpc/local.i.json`, ipc.py:221-232): runs a batch open + Beaver
multiply program over real sockets."""

import asyncio
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from honeybadgermpc_tpu.config import HbmpcConfig
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.parallel.async_context import LocalPreproc
from honeybadgermpc_tpu.parallel.ipc import ProcessProgramRunner
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements


async def prog(ctx):
    pre = ctx.preproc
    x = ctx.ShareArray(pre.get_rands(4))
    opened = await x.open()
    print(f"[{ctx.my_id}] opened 4 random shares:",
          [int(v) % 1000 for v in opened.to_ints()])
    a = ctx.ShareArray(pre.get_rands(2))
    b = ctx.ShareArray(pre.get_rands(2))
    ab = await ctx.mul(a, b)
    print(f"[{ctx.my_id}] beaver product opened:",
          [int(v) % 1000 for v in (await ab.open()).to_ints()])


async def main():
    cfg = HbmpcConfig.load_config()
    assert cfg.N is not None, "run with -d -f conf/mpc/local.<i>.json"
    # deterministic dealer so every process holds consistent shares
    pre = PreProcessedElements(cfg.N, cfg.t, seed=99)
    pre.generate_rands(64)
    pre.generate_triples(64)
    local = LocalPreproc(pre, cfg.my_id)
    async with ProcessProgramRunner(cfg.peers, cfg.N, cfg.t,
                                    cfg.my_id) as runner:
        task = runner.execute("main", prog, preproc=local)
        await task


if __name__ == "__main__":
    asyncio.run(main())
