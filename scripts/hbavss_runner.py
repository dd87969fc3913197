"""HBAVSS process runner (reference scripts/hbavss_light.py /
hbavss_batch.py): one party per OS process over NodeCommunicator, party 0
deals, everyone receives, deal+receive wall time is reported.

    python scripts/hbavss_runner.py -d -f conf/mpc/local.0.json [--batch]
    ./scripts/launch-tmuxlocal.sh "scripts/hbavss_runner.py --batch" conf/mpc 4

The threshold keys come from the fixed-seed `get_avss_params` (reference
offline_robust.py:15-21) so all processes agree without a dealer round.
"""

import asyncio
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


async def _main():
    from honeybadgermpc_tpu.config import HbmpcConfig
    from honeybadgermpc_tpu.field import GF
    from honeybadgermpc_tpu.elliptic_curve import Subgroup
    from honeybadgermpc_tpu.parallel.ipc import NodeCommunicator
    from honeybadgermpc_tpu.crypto.poly_commit_const import gen_pc_const_crs
    from honeybadgermpc_tpu.protocols.hbavss import (HbAvssBatch,
                                                     HbAvssLight,
                                                     get_avss_params)
    from honeybadgermpc_tpu.utils.misc import subscribe_recv, wrap_send

    batch = "--batch" in sys.argv
    cfg = HbmpcConfig.load_config()
    n, t, my_id = cfg.N, cfg.t, cfg.my_id
    field = GF(Subgroup.BLS12_381)
    k = int(cfg.extras.get("k", 8)) if cfg.extras else 8

    async with NodeCommunicator(cfg.peers, my_id) as node:
        subscribe_task, subscribe = subscribe_recv(node.recv)
        send = wrap_send("avss", node.send)
        recv = subscribe("avss")

        g, h, pks, sks = get_avss_params(n, t)
        t0 = time.perf_counter()
        if batch:
            crs = gen_pc_const_crs(t, g=g, h=h, seed=7)
            avss = HbAvssBatch(pks, sks[my_id], crs, n, t, my_id,
                               send, recv)
            values = ([field.random(i).value for i in range(k)]
                      if my_id == 0 else None)
            out = await avss.avss(0, values=values, dealer_id=0)
        else:
            avss = HbAvssLight(pks, sks[my_id], g, h, n, t,
                               my_id, send, recv)
            value = field.random(0).value if my_id == 0 else None
            out = await avss.avss(0, value=value, dealer_id=0)
        dt = time.perf_counter() - t0
        avss.kill()
        subscribe_task.cancel()
        mode = "batch" if batch else "light"
        logging.info("[%d] hbavss-%s done in %.3fs (out=%s...)",
                     my_id, mode, dt, str(out)[:48])
        print(f"party {my_id}: hbavss-{mode} deal+receive {dt:.3f}s")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    asyncio.run(_main())
