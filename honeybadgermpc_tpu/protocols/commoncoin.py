"""Threshold-BLS common coin (reference broadcast/commoncoin.py:26-156).

Each round: sign H(sid || round) with the threshold key; f+1 valid shares
combine to a unique signature; the coin is the low bit of its hash. The
returned ``get_coin(round)`` coroutine serves arbitrary rounds; a
background task collects shares.
"""

from __future__ import annotations

import asyncio
import hashlib
import pickle
from collections import defaultdict

from ..crypto.boldyreva import TBLSPrivateKey, TBLSPublicKey
from ..utils.misc import print_exception_callback


async def shared_coin(sid, pid, n, f, pk: TBLSPublicKey, sk: TBLSPrivateKey,
                      broadcast, receive):
    """Returns (get_coin, recv_task). get_coin(r) -> int in {0, 1}."""
    assert pk.k == f + 1 and pk.l == n
    received = defaultdict(dict)
    output = defaultdict(asyncio.Future)
    hashes = {}

    def h_of(r):
        if r not in hashes:
            hashes[r] = pk.hash_message(pickle.dumps((sid, r)))
        return hashes[r]

    async def _recv_loop():
        while True:
            sender, (r, raw) = await receive()
            if sender in received[r] or output[r].done():
                continue
            share = pickle.loads(raw)
            received[r][sender] = share
            # Optimistic: combine the first f+1 shares and verify only the
            # combined signature (2 pairings instead of 2 per share). On
            # failure, fall back to per-share verification and drop bad
            # shares (Byzantine path).
            if len(received[r]) >= f + 1 and not output[r].done():
                subset = dict(list(received[r].items())[:f + 1])
                sig = pk.combine_shares(subset)
                if not pk.verify_signature(sig, h_of(r)):
                    for i, s in list(received[r].items()):
                        if not pk.verify_share(s, i, h_of(r)):
                            del received[r][i]
                    if len(received[r]) < f + 1:
                        continue
                    sig = pk.combine_shares(
                        dict(list(received[r].items())[:f + 1]))
                    if not pk.verify_signature(sig, h_of(r)):
                        continue
                bit = hashlib.sha256(pickle.dumps(sig)).digest()[0] & 1
                output[r].set_result(bit)

    task = asyncio.ensure_future(_recv_loop())
    task.add_done_callback(print_exception_callback)

    async def get_coin(r):
        broadcast((r, pickle.dumps(sk.sign(h_of(r)))))
        return await output[r]

    return get_coin, task
