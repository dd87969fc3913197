"""AsynchroMix: client-input mixing service coordinated by a contract
(reference apps/asynchromix/asynchromix.py:55-562 + asynchromix.sol).

Event-driven parity with the reference: clients and servers interact ONLY
through the coordinator contract's calls and emitted events — reserve an
input mask (InputMaskClaimed), publish the masked message
(MessageSubmitted), watch MixingEpochInitiated to run the epoch's MPC, and
vote outputs until t+1 agree (MixOutput). The contract artifact ships at
``apps/contracts/AsynchromixCoordinator.sol``; with web3 absent from this
image the same state machine runs in-process (``apps/evm_double.py``) —
the drivers here only see the call + event-log surface a chain offers.

The MPC side is the real framework: masks from preprocessing, per-epoch
mixing via the butterfly network or power mixing on device kernels.

Run: python apps/asynchromix.py  (single-host simulation, one epoch)
"""

from __future__ import annotations

import asyncio
import math
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from evm_double import AsynchromixCoordinator, Revert  # noqa: E402

from honeybadgermpc_tpu.elliptic_curve import Subgroup  # noqa: E402
from honeybadgermpc_tpu.field import GF  # noqa: E402
from honeybadgermpc_tpu.models.butterfly import \
    iterated_butterfly_network_jit  # noqa: E402
from honeybadgermpc_tpu.models.powermixing import power_mix  # noqa: E402
from honeybadgermpc_tpu.ops.fparray import FpArray  # noqa: E402
from honeybadgermpc_tpu.polynomial import polynomials_over  # noqa: E402
from honeybadgermpc_tpu.runtime.context import MpcContext  # noqa: E402
from honeybadgermpc_tpu.runtime.preprocessing import \
    PreProcessedElements  # noqa: E402
from honeybadgermpc_tpu.utils.misc import \
    print_exception_callback  # noqa: E402

P = Subgroup.BLS12_381
POLL = 0.005   # reference loops poll every 5 s on-chain; sim polls fast


class MockCoordinator:
    """Minimal synchronous double (kept as the unit-test stand-in; the
    event-driven flow below uses evm_double.AsynchromixCoordinator)."""

    def __init__(self, k_per_epoch: int):
        self.k = k_per_epoch
        self.next_mask = 0
        self.queue = []
        self.epochs = []

    def reserve_input_mask(self) -> int:
        idx = self.next_mask
        self.next_mask += 1
        return idx

    def submit_message(self, mask_idx: int, masked_value: int):
        self.queue.append((mask_idx, masked_value))

    def ready_epoch(self):
        if len(self.queue) >= self.k:
            batch, self.queue = self.queue[:self.k], self.queue[self.k:]
            return batch
        return None


class ServerGroupSim:
    """Single-host simulation of the n servers' shared MPC state: dealt
    share tensors plus the per-epoch mix computed once (every server
    proposes the result from its own view). In a real deployment each
    server holds one share slice and the mix runs over the network; the
    contract-facing drivers (below) are identical either way."""

    def __init__(self, n, t, k_per_epoch, seed=0, mix="butterfly"):
        self.n, self.t, self.k = n, t, k_per_epoch
        self.mix = mix
        self.rounds = int(math.log2(k_per_epoch)) ** 2
        self.pre = PreProcessedElements(n, t, seed=seed)
        self.ctx = MpcContext(n, t, preproc=self.pre)
        self.mask_count = 0
        self.mix_budget = 0          # epochs' worth of triples/bits dealt
        self._masks = None           # FpArray [n, mask_count]
        self._mix_results = {}       # epoch -> sorted plaintexts
        if mix == "powers":
            self.pre.generate_powers(k_per_epoch, k_per_epoch)

    # -- offline phase (the servers' preprocessing runs, reference
    # _offline_inputmasks_loop / _offline_mixes_loop) --------------------
    def deal_masks(self, count: int) -> int:
        self.pre.generate_rands(count)
        batch = self.pre.get_rands(count)                # [n, count]
        self._masks = (batch if self._masks is None else
                       FpArray.concatenate([self._masks, batch], axis=1))
        self.mask_count += count
        return self.mask_count

    def deal_mix_preproc(self, epochs: int = 1) -> int:
        self.pre.generate_triples(epochs * self.rounds * self.k)
        self.pre.generate_one_minus_ones(epochs * self.rounds * self.k)
        self.mix_budget += epochs
        return self.mix_budget

    def counts(self):
        """(triples, bits, inputmasks) still unclaimed — the per-server
        preprocess_report payload."""
        return (self.mix_budget * self.rounds * self.k,
                self.mix_budget * self.rounds * self.k,
                self.mask_count)

    # -- online ------------------------------------------------------------
    def mask_share(self, server_id: int, idx: int) -> int:
        return int(FpArray(self._masks.limbs[:, server_id, idx]).to_int())

    def mix_epoch(self, epoch: int, pairs) -> list:
        """pairs: [(masked_input, mask_idx)] — unmask inside MPC, mix,
        open. Computed once per epoch; idempotent across servers."""
        if epoch not in self._mix_results:
            idxs = [i for _, i in pairs]
            masked = [v for v, _ in pairs]
            mask_shares = self._masks.take(idxs, axis=1)   # [n, K]
            msg_shares = self.ctx.ShareArray(
                FpArray.from_ints(masked).broadcast_to(
                    (self.n, self.k)) - mask_shares, self.t)
            if self.mix == "butterfly":
                mixed = iterated_butterfly_network_jit(
                    self.ctx, msg_shares, self.k)
                opened = mixed.open()
                # host-convert ONE party's view (all agree; converting all
                # n was 4x the bigint work)
                out = sorted(int(v) for v in FpArray(
                    opened.limbs[:, 0]).to_ints())
            else:
                b_powers = self.ctx.from_preproc(self.pre.get_powers(self.k))
                out = power_mix(self.ctx, msg_shares, b_powers)
            self._mix_results[epoch] = out
        return self._mix_results[epoch]


class AsynchromixServer:
    """One server's contract-facing driver (reference AsynchromixServer,
    asynchromix.py:144-320): reports preprocessing, serves authorized
    mask-share requests off-chain, initiates epochs, watches
    MixingEpochInitiated, runs the epoch MPC and proposes the output."""

    def __init__(self, myid: int, coord: AsynchromixCoordinator, account,
                 group: ServerGroupSim, mask_target: int | None = None,
                 mix_target: int = 2):
        self.myid, self.coord, self.account = myid, coord, account
        self.group = group
        self.mask_target = mask_target or 2 * group.k
        self.mix_target = mix_target
        self._tasks = []

    def start(self):
        for coro in (self._offline_loop(), self._initiate_loop(),
                     self._mixing_loop()):
            t = asyncio.ensure_future(coro)
            t.add_done_callback(print_exception_callback)
            self._tasks.append(t)
        return self

    def kill(self):
        for t in self._tasks:
            t.cancel()

    # off-chain share channel (reference: clients request shares over
    # https; servers check contract authorization, asynchromix.py:84-95)
    async def req_mask(self, client, idx: int) -> int:
        if not self.coord.client_authorized(client, idx):
            raise PermissionError(f"client {client} not authorized for {idx}")
        return self.group.mask_share(self.myid, idx)

    async def _offline_loop(self):
        """Maintain preprocessing buffers above target and report counts
        (reference _offline_inputmasks_loop / _offline_mixes_loop; the
        consensus buffer is the min over all servers' reports)."""
        while True:
            did = False
            if self.coord.inputmasks_available() < self.mask_target and \
                    self.group.mask_count - self.coord.preprocess_used[2] \
                    < self.mask_target:
                # group deal is shared; idempotence: only the first server
                # to notice tops the pool up this round
                self.group.deal_masks(self.mask_target)
                did = True
            if self.coord.mixes_available() < self.mix_target and \
                    self.group.mix_budget * self.coord.PER_MIX_TRIPLES - \
                    self.coord.preprocess_used[0] < \
                    self.mix_target * self.coord.PER_MIX_TRIPLES:
                self.group.deal_mix_preproc(self.mix_target)
                did = True
            # report own counts regardless (consensus needs ALL reports)
            rep = self.group.counts()
            if (self.coord.preprocess_reports.get(self.myid) != list(rep)
                    or did):
                self.coord.preprocess_report(rep, sender=self.account)
            await asyncio.sleep(POLL)

    async def _initiate_loop(self):
        """Trigger a mix once K inputs + preprocessing are ready
        (reference _mixing_initiate_loop)."""
        while True:
            if (self.coord.inputs_ready() >= self.coord.K
                    and self.coord.mixes_available() >= 1):
                try:
                    self.coord.initiate_mix(sender=self.account)
                except Revert:
                    pass          # another server won the race
            await asyncio.sleep(POLL)

    async def _mixing_loop(self):
        """Consume MixingEpochInitiated events; run the MPC; vote the
        output (reference _mixing_loop, asynchromix.py:305-320)."""
        epoch = 0
        while True:
            if self.coord.epochs_initiated <= epoch:
                await asyncio.sleep(POLL)
                continue
            K = self.coord.K
            pairs = [self.coord.input_queue(i)
                     for i in range(epoch * K, (epoch + 1) * K)]
            mixed = self.group.mix_epoch(epoch, pairs)
            output = ",".join(str(v) for v in mixed)
            try:
                self.coord.propose_output(epoch, output, sender=self.account)
            except Revert:
                pass
            epoch += 1


class AsynchromixClient:
    """Client flow (reference AsynchromixClient, asynchromix.py:55-130):
    wait for masks, reserve one on-chain, privately reconstruct it from
    the servers' shares, publish m + r."""

    def __init__(self, account, coord: AsynchromixCoordinator, servers):
        self.account, self.coord, self.servers = account, coord, servers
        self.poly = polynomials_over(GF(P))

    async def _get_inputmask(self, idx: int) -> int:
        shares = await asyncio.gather(*[
            s.req_mask(self.account, idx) for s in self.servers])
        t = self.coord.t
        pts = [(i + 1, s) for i, s in enumerate(shares)][:t + 1]
        return int(self.poly.interpolate_at(pts, 0))

    async def send_message(self, m: int) -> int:
        while self.coord.inputmasks_available() < 1:
            await asyncio.sleep(POLL)
        rcpt = self.coord.reserve_inputmask(sender=self.account)
        idx = rcpt.events[0].args["inputmask_idx"]
        mask = await self._get_inputmask(idx)
        self.coord.submit_message(idx, (m + mask) % P, sender=self.account)
        return idx


async def run_one_epoch(n=4, t=1, k=8, seed=7, mix="butterfly"):
    """One full event-driven epoch; returns (messages, mixed_output)."""
    rng = random.Random(seed)
    accounts = [f"server{i}" for i in range(n)]
    coord = AsynchromixCoordinator(accounts, t, k=k)
    group = ServerGroupSim(n, t, k, seed=seed, mix=mix)
    servers = [AsynchromixServer(i, coord, accounts[i], group).start()
               for i in range(n)]
    messages = [rng.randrange(P) for _ in range(k)]
    clients = [AsynchromixClient(f"client{j}", coord, servers)
               for j in range(k)]
    try:
        await asyncio.gather(*[c.send_message(m)
                               for c, m in zip(clients, messages)])
        while coord.outputs_ready < 1:          # watch for MixOutput
            await asyncio.sleep(POLL)
    finally:
        for s in servers:
            s.kill()
    ev = coord.get_events("MixOutput")[0]
    mixed = [int(v) for v in ev.args["output"].split(",")]
    return messages, mixed


def main():
    messages, mixed = asyncio.run(run_one_epoch())
    assert sorted(messages) == sorted(mixed), "mixing lost messages!"
    print(f"asynchromix: epoch of {len(messages)} messages mixed correctly "
          "(event-driven: InputMaskClaimed -> MessageSubmitted -> "
          "MixingEpochInitiated -> MixOutput)")


if __name__ == "__main__":
    main()
