"""Tutorial 2: MPC over real sockets (reference
apps/tutorial/hbmpc-tutorial-2.py): one OS process per party, ZMQ
transport, READY-file preprocessing barrier, several programs packed
onto one ProcessProgramRunner.

Run all parties locally (spawns n subprocesses):

    python apps/tutorial_2.py

or one party per terminal/host:

    python apps/tutorial_2.py --party <i>
"""

import argparse
import asyncio
import os
import shutil
import subprocess
import sys

# n local processes share the host; the MPC math here is tiny — run on CPU
# so the parties don't contend for the chip (real fleets: one chip each).
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.parallel.async_context import LocalPreproc
from honeybadgermpc_tpu.parallel.ipc import ProcessProgramRunner
from honeybadgermpc_tpu.runtime.preprocessing import (PreProcessedElements,
                                                      preprocessing_done,
                                                      wait_for_preprocessing)

N, T = 4, 1
BASE_PORT = 23410
SHAREDATA = os.path.join(os.path.dirname(__file__), "..", "sharedata.tut2")


async def prog_open(ctx):
    opened = await ctx.ShareArray(ctx.preproc.get_rands(8)).open()
    print(f"[{ctx.my_id}] opened:", [int(v) % 1000 for v in opened.to_ints()])


async def prog_beaver(ctx):
    a = ctx.ShareArray(ctx.preproc.get_rands(4))
    b = ctx.ShareArray(ctx.preproc.get_rands(4))
    ab = await ctx.mul(a, b)
    av, bv, abv = [ (await s.open()).to_ints() for s in (a, b, ab) ]
    p = Subgroup.BLS12_381
    assert all(int(x) * int(y) % p == int(z)
               for x, y, z in zip(av, bv, abv))
    print(f"[{ctx.my_id}] beaver products verified")


async def party_main(my_id: int):
    peers = {i: ("127.0.0.1", BASE_PORT + i) for i in range(N)}
    if my_id == 0:
        pre = PreProcessedElements(N, T, seed=1234)
        pre.generate_rands(256)
        pre.generate_triples(256)
        pre.save(SHAREDATA)
        preprocessing_done(SHAREDATA)
    else:
        wait_for_preprocessing(SHAREDATA, timeout=600)
        pre = PreProcessedElements(N, T, seed=1234)
        pre.load(SHAREDATA)
    local = LocalPreproc(pre, my_id)
    async with ProcessProgramRunner(peers, N, T, my_id) as runner:
        # pack two independent programs onto one communicator, each under
        # its own session tag (the reference's "packing" demo)
        t1 = runner.execute("tutorial-open", prog_open, preproc=local)
        t2 = runner.execute("tutorial-beaver", prog_beaver, preproc=local)
        await asyncio.gather(t1, t2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--party", type=int, default=None)
    args = ap.parse_args()
    if args.party is not None:
        asyncio.run(party_main(args.party))
        return
    shutil.rmtree(SHAREDATA, ignore_errors=True)
    procs = [subprocess.Popen([sys.executable, __file__, "--party", str(i)])
             for i in range(N)]
    codes = [p.wait(timeout=300) for p in procs]
    shutil.rmtree(SHAREDATA, ignore_errors=True)
    assert all(c == 0 for c in codes), codes
    print("tutorial 2: all parties done")


if __name__ == "__main__":
    main()
