"""Bracha-style reliable broadcast with erasure coding (reference
broadcast/reliablebroadcast.py:137-300).

VAL/ECHO/READY state machine over the send/recv contract; payload striped
(k = n - 2f) with Merkle branch proofs; thresholds: n-f ECHO to READY,
f+1 READY amplification, 2f+1 READY + k matching stripes to decode; the
decoded payload is re-encoded and re-verified against the Merkle root
before output (:223-231)."""

from __future__ import annotations

from collections import defaultdict

from . import erasure
from .merkle import merkle_branch, merkle_root, merkle_tree, merkle_verify


async def reliablebroadcast(sid, pid: int, n: int, f: int, leader: int,
                            input_getter, receive, send, client_mode=False):
    """Returns the broadcast bytes. If pid == leader, awaits input_getter()
    for the payload. client_mode: leader is an external n+1-th dealer that
    only sends VAL and exits (reliablebroadcast.py:193-211)."""
    assert n >= 3 * f + 1 and 0 <= f and 0 <= leader < n + (1 if client_mode else 0)

    k = n - 2 * f
    echo_threshold = n - f
    ready_threshold = f + 1
    output_threshold = 2 * f + 1

    def broadcast(o):
        for dest in range(n):
            send(dest, o)

    if pid == leader:
        m = await input_getter() if callable(input_getter) else input_getter
        assert isinstance(m, (bytes, bytearray, str))
        if isinstance(m, str):
            m = m.encode()
        stripes = [erasure.serialize_stripe(s) for s in erasure.encode(k, n, m)]
        tree = merkle_tree(stripes)
        root = merkle_root(tree)
        for i in range(n):
            send(i, ("VAL", root, merkle_branch(tree, i), stripes[i]))
        if client_mode:
            return

    stripes_store = defaultdict(lambda: [None] * n)
    echo_counter = defaultdict(int)
    echo_senders = set()
    ready_senders = set()
    ready_sent = False
    ready_digest = defaultdict(set)
    from_leader = None

    def decode_validate_output(root):
        raw = [erasure.deserialize_stripe(s) if s is not None else None
               for s in stripes_store[root]]
        m = erasure.decode(k, n, raw)
        # re-encode and verify root (defense against a bad leader)
        stripes2 = [erasure.serialize_stripe(s) for s in erasure.encode(k, n, m)]
        if merkle_root(merkle_tree(stripes2)) == root:
            return m
        return None

    while True:
        sender, msg = await receive()
        if msg[0] == "VAL" and from_leader is None:
            _, root, branch, stripe = msg
            if sender != leader:
                continue
            if not merkle_verify(n, stripe, root, branch, pid):
                continue
            from_leader = root
            broadcast(("ECHO", root, branch, stripe))
        elif msg[0] == "ECHO":
            _, root, branch, stripe = msg
            if sender in echo_senders:
                continue
            if not merkle_verify(n, stripe, root, branch, sender):
                continue
            echo_senders.add(sender)
            stripes_store[root][sender] = stripe
            echo_counter[root] += 1
            if echo_counter[root] >= echo_threshold and not ready_sent:
                ready_sent = True
                broadcast(("READY", root))
            if len(ready_digest[root]) >= output_threshold and \
                    echo_counter[root] >= k:
                m = decode_validate_output(root)
                if m is not None:
                    return m
        elif msg[0] == "READY":
            _, root = msg
            if sender in ready_senders:
                continue
            ready_senders.add(sender)
            ready_digest[root].add(sender)
            if len(ready_digest[root]) >= ready_threshold and not ready_sent:
                ready_sent = True
                broadcast(("READY", root))
            if len(ready_digest[root]) >= output_threshold and \
                    echo_counter[root] >= k:
                m = decode_validate_output(root)
                if m is not None:
                    return m
