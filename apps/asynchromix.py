"""AsynchroMix: client-input mixing service (reference
apps/asynchromix/asynchromix.py:55-562 + asynchromix.sol).

The reference coordinates epochs through an Ethereum contract; this build
substitutes an in-process ``MockCoordinator`` with the same contract
surface (reserve input mask, submit masked message, epoch watermarks) —
web3 is not in the image, and the coordination logic is chain-agnostic.
The MPC side is the real framework: masks from preprocessing, per-epoch
mixing via the butterfly network or power mixing on device kernels.

Run: python apps/asynchromix.py  (single-host simulation, K clients)
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.models.butterfly import \
    iterated_butterfly_network_jit
from honeybadgermpc_tpu.models.powermixing import power_mix
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.runtime.context import MpcContext
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

P = Subgroup.BLS12_381


class MockCoordinator:
    """Contract-surface double (asynchromix.sol): input-mask reservation,
    masked-input queue, epoch batching (K inputs per epoch)."""

    def __init__(self, k_per_epoch: int):
        self.k = k_per_epoch
        self.next_mask = 0
        self.queue = []          # masked inputs (public field elements)
        self.epochs = []         # processed epochs: list of input lists

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


class AsynchroMixClient:
    """Client flow (reference :55-130): reserve a mask index, learn
    m + r from t+1 servers' mask shares, publish the masked message."""

    def __init__(self, coordinator, servers):
        self.coord = coordinator
        self.servers = servers

    def send(self, message: int):
        idx = self.coord.reserve_input_mask()
        # reconstruct the mask from the servers (t+1 shares suffice)
        mask = self.servers.open_input_mask(idx)
        self.coord.submit_message(idx, (message + mask) % P)
        return idx


class AsynchroMixServers:
    """The n-server MPC side (single-host simulated)."""

    def __init__(self, n, t, k_per_epoch, seed=0, mix="butterfly"):
        self.n, self.t, self.k = n, t, k_per_epoch
        self.mix = mix
        import math
        rounds = int(math.log2(k_per_epoch)) ** 2
        pre = PreProcessedElements(n, t, seed=seed)
        pre.generate_rands(max(128, 2 * k_per_epoch))   # input masks
        pre.generate_triples(rounds * k_per_epoch)      # one per switch
        pre.generate_one_minus_ones(rounds * k_per_epoch)
        pre.generate_powers(k_per_epoch, k_per_epoch)
        self.ctx = MpcContext(n, t, preproc=pre)
        self.masks = self.ctx.from_preproc(
            pre.get_rands(max(128, 2 * k_per_epoch)))
        self._mask_values = self.masks.open()   # cached plain (dealer sim)

    def open_input_mask(self, idx: int) -> int:
        return int(self._mask_values.to_ints()[0][idx])

    def mix_epoch(self, batch):
        """Unmask inside MPC and mix: returns the shuffled plaintexts."""
        idxs = [i for i, _ in batch]
        masked = [v for _, v in batch]
        mask_shares = self.masks.take(idxs, axis=0)
        msg_shares = self.ctx.ShareArray(
            FpArray.from_ints(masked) - mask_shares.v, self.t)
        if self.mix == "butterfly":
            mixed = iterated_butterfly_network_jit(self.ctx, msg_shares,
                                                  self.k)
            return sorted(int(v) for v in mixed.open().to_ints()[0])
        b_powers = self.ctx.from_preproc(self.ctx.preproc.get_powers(self.k))
        return power_mix(self.ctx, msg_shares, b_powers)


def main():
    n, t, k = 4, 1, 8
    rng = random.Random(7)
    coord = MockCoordinator(k)
    servers = AsynchroMixServers(n, t, k)
    clients = [AsynchroMixClient(coord, servers) for _ in range(k)]
    messages = [rng.randrange(P) for _ in range(k)]
    for c, m in zip(clients, messages):
        c.send(m)
    batch = coord.ready_epoch()
    assert batch is not None
    mixed = servers.mix_epoch(batch)
    assert sorted(messages) == sorted(mixed), "mixing lost messages!"
    print(f"asynchromix: epoch of {k} messages mixed correctly")


if __name__ == "__main__":
    main()
