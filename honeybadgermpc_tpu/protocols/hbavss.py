"""HoneyBadger Asynchronous Verifiable Secret Sharing (reference
hbavss.py: HbAvssLight :32-324, HbAvssBatch :327-678).

HbAvssLight: dealer commits to a degree-t polynomial (Pedersen, linear
size), ECDH-encrypts each party's (share, witness) under an ephemeral key,
and reliably-broadcasts one blob. Receivers verify and vote OK; a cheated
receiver IMPLICATEs by revealing its shared key with a Chaum-Pedersen DLEQ
proof, after which honest parties enter RECOVERY and the victim
interpolates its share from t+1 verified shares (hbavss.py:86-201).

HbAvssBatch: B secrets at once; constant-size KZG commitments are RBC'd
while the per-party encrypted payloads travel via AVID dispersal
(hbavss.py:567-666); same implicate/recover machinery per batch.
"""

from __future__ import annotations

import asyncio
import hashlib
import pickle
import random as _random

from ..betterpairing import G1, ZR, interpolate_g1_at_x
from ..crypto import symmetric
from ..crypto.poly_commit_const import PolyCommitConst, eval_poly
from ..crypto.poly_commit_lin import PolyCommitLin
from ..field import GF
from ..elliptic_curve import Subgroup
from ..polynomial import polynomials_over
from ..utils.misc import (print_exception_callback, subscribe_recv,
                          wrap_send)
from .avid import AVID
from .reliablebroadcast import reliablebroadcast


def get_avss_params(n, t, seed=0):
    """Per-party keypairs (hardcoded-seed parity with offline_robust.py
    get_avss_params :15-21)."""
    g, h = G1.rand(b"g"), G1.rand(b"h")
    rng = _random.Random(seed)
    sks = [ZR(rng.randrange(1, int(2 ** 255))) for _ in range(n)]
    pks = [g ** sk for sk in sks]
    return g, h, pks, sks


def _dleq_prove(g, x, h_, y, alpha: ZR):
    """Chaum-Pedersen NIZK: log_g(x) == log_h_(y) == alpha."""
    w = ZR.rand()
    a1, a2 = g ** w, h_ ** w
    e = ZR.hash(pickle.dumps((a1, a2, x, y)))
    z = w + alpha * e
    return (a1, a2, z)


def _dleq_verify(g, x, h_, y, proof) -> bool:
    a1, a2, z = proof
    e = ZR.hash(pickle.dumps((a1, a2, x, y)))
    return (g ** z == a1 * (x ** e)) and (h_ ** z == a2 * (y ** e))


class HbAvssLight:
    """Single-secret AVSS (scalar per instance; avss_parallel runs many)."""

    def __init__(self, public_keys, private_key, g, h, n, t, my_id,
                 send, recv, pc=None):
        self.pks, self.sk = public_keys, private_key
        self.g, self.h = g, h
        self.n, self.t, self.my_id = n, t, my_id
        self.send, self.recv = send, recv
        self.pc = pc or PolyCommitLin([g, h])
        self.field = GF(Subgroup.BLS12_381)
        self.poly = polynomials_over(self.field)
        self._recv_task, self._subscribe = subscribe_recv(recv)
        self._tasks = []

    def kill(self):
        self._recv_task.cancel()
        for t in self._tasks:
            t.cancel()

    def _mk(self, tag):
        return wrap_send(tag, self.send), self._subscribe(tag)

    def _dealer_msg(self, value) -> bytes:
        phi = self.poly.random(self.t, value)
        commitments, aux_poly = self.pc.commit(phi)
        esk = ZR.rand()
        ephemeral_public_key = self.g ** esk
        z = []
        for i in range(self.n):
            shared_key = self.pks[i] ** esk
            blob = symmetric.encrypt(
                shared_key, (int(phi(i + 1)), int(self.pc.create_witness(aux_poly, i + 1))))
            z.append(blob)
        return pickle.dumps((commitments, ephemeral_public_key, z))

    async def avss(self, avss_id, value=None, dealer_id=None,
                   client_mode=False):
        """Deal (if dealer) / receive a share of one secret. Returns this
        party's share as an int (field element value).

        client_mode (reference hbavss.py:269-305): the dealer is an
        EXTERNAL (n+1)-th node with id n — it runs the RBC as leader over
        n+1 parties (reliablebroadcast client_mode sends VAL only,
        reliablebroadcast.py:193-211 / ours :44) and returns None right
        after; only the n regular parties verify, vote, and output shares.
        """
        if dealer_id is None:
            dealer_id = self.my_id
        if client_mode:
            assert dealer_id == self.n, "client dealer is the (n+1)-th node"
        broadcast_msg = None
        if self.my_id == dealer_id:
            assert value is not None
            broadcast_msg = self._dealer_msg(value)

        tag = f"{dealer_id}-{avss_id}-RBC"
        rbc_send, rbc_recv = self._mk(tag)
        rbc_n = self.n + 1 if client_mode else self.n
        blob = await reliablebroadcast(
            tag, self.my_id, rbc_n, self.t, dealer_id,
            broadcast_msg, rbc_recv, rbc_send, client_mode=client_mode)
        if client_mode and self.my_id == dealer_id:
            # the external dealer does nothing after the initial dispatch
            return None
        commitments, epk, z = pickle.loads(blob)

        vote_tag = f"{dealer_id}-{avss_id}-AVSS"
        vote_send, vote_recv = self._mk(vote_tag)

        def vote_bcast(o):
            for dest in range(self.n):
                vote_send(dest, o)

        shared_key = epk ** self.sk
        share, witness, ok = None, None, False
        try:
            share, witness = symmetric.decrypt(shared_key, z[self.my_id])
            ok = self.pc.verify_eval(
                commitments, self.my_id + 1, ZR(share), ZR(witness))
        except ValueError:
            ok = False

        if ok:
            vote_bcast(("OK",))
        else:
            proof = _dleq_prove(self.g, self.pks[self.my_id],
                                epk, shared_key, self.sk)
            vote_bcast(("IMPLICATE", shared_key, proof))

        # The vote handler must OUTLIVE this party's own output: honest
        # parties keep serving IMPLICATE/RECOVER so a cheated party can
        # finish (reference keeps _process_avss_msg running in the
        # background, hbavss.py:86-201).
        output = asyncio.Future()
        state = {"share": share, "witness": witness, "ok": ok,
                 "in_recovery": False}
        oks = set()
        recovery_shares = {}

        async def handler():
            while True:
                sender, msg = await vote_recv()
                if msg[0] == "OK":
                    oks.add(sender)
                    if len(oks) >= 2 * self.t + 1 and                             state["share"] is not None and not output.done():
                        output.set_result(state["share"])
                elif msg[0] == "IMPLICATE" and not state["in_recovery"]:
                    _, their_key, proof = msg
                    if not _dleq_verify(self.g, self.pks[sender], epk,
                                        their_key, proof):
                        continue
                    try:
                        s2, w2 = symmetric.decrypt(their_key, z[sender])
                        valid = self.pc.verify_eval(
                            commitments, sender + 1, ZR(s2), ZR(w2))
                    except ValueError:
                        valid = False
                    if not valid:
                        state["in_recovery"] = True
                        if state["ok"]:
                            vote_bcast(("RECOVER", state["share"],
                                        state["witness"]))
                elif msg[0] == "RECOVER":
                    _, s2, w2 = msg
                    if self.pc.verify_eval(commitments, sender + 1,
                                           ZR(s2), ZR(w2)):
                        recovery_shares[sender + 1] = s2
                    if state["share"] is None and                             len(recovery_shares) == self.t + 1:
                        state["share"] = int(self.poly.interpolate_at(
                            list(recovery_shares.items()), self.my_id + 1))
                        vote_bcast(("OK",))

        task = asyncio.ensure_future(handler())
        self._tasks.append(task)
        return await output

    async def avss_parallel(self, avss_id, k, values=None, dealer_id=None):
        """k concurrent instances (hbavss.py:309-324)."""
        if values is None:
            values = [None] * k
        return await asyncio.gather(*[
            self.avss((avss_id, i), values[i], dealer_id) for i in range(k)])


class HbAvssBatch:
    """Batched AVSS: one RBC of (KZG commitments, epk), payloads via AVID
    (hbavss.py:327-678)."""

    def __init__(self, public_keys, private_key, crs, n, t, my_id,
                 send, recv):
        self.pks, self.sk = public_keys, private_key
        self.pc = PolyCommitConst(crs)
        self.g = crs[0][0]
        self.n, self.t, self.my_id = n, t, my_id
        self.send, self.recv = send, recv
        self.field = GF(Subgroup.BLS12_381)
        self.poly = polynomials_over(self.field)
        self._recv_task, self._subscribe = subscribe_recv(recv)
        self._tasks = []

    def kill(self):
        self._recv_task.cancel()
        for t in self._tasks:
            t.cancel()

    def _mk(self, tag):
        return wrap_send(tag, self.send), self._subscribe(tag)

    async def avss(self, avss_id, values=None, dealer_id=None):
        """Deal/receive a batch; returns list of this party's shares."""
        if dealer_id is None:
            dealer_id = self.my_id
        B = None
        rbc_blob = None
        avid_inputs = None
        if self.my_id == dealer_id:
            assert values is not None
            B = len(values)
            # Two-round share recovery interpolates each party's column
            # polynomial (degree B-1) from 2t+1 R2 points, so a dealing is
            # only recoverable when B <= 2t+1 (reference hbavss.py:529-546
            # operates under the same implicit constraint). Reject larger
            # batches here rather than deal something recovery would
            # silently mis-interpolate; callers chunk into sub-dealings.
            if B > 2 * self.t + 1:
                raise ValueError(
                    f"HbAvssBatch: batch size {B} > 2t+1 = {2 * self.t + 1}"
                    " is unrecoverable; split into multiple avss() calls")
            phis, hats, commits = [], [], []
            for v in values:
                phi = self.poly.random(self.t, v)
                c, hat = self.pc.commit(phi)
                phis.append(phi)
                hats.append(hat)
                commits.append(c)
            esk = ZR.rand()
            epk = self.g ** esk
            avid_inputs = []
            for i in range(self.n):
                shared_key = self.pks[i] ** esk
                payload = [(int(phis[b](i + 1)),
                            int(eval_poly(hats[b], i + 1)),
                            self.pc.create_witness(phis[b], hats[b], i + 1))
                           for b in range(B)]
                avid_inputs.append(symmetric.encrypt(shared_key, payload))
            rbc_blob = pickle.dumps((commits, epk, B))

        # RBC the commitments; AVID the payloads
        rbc_tag = f"{dealer_id}-{avss_id}-B-RBC"
        rbc_send, rbc_recv = self._mk(rbc_tag)
        blob = await reliablebroadcast(
            rbc_tag, self.my_id, self.n, self.t, dealer_id,
            rbc_blob, rbc_recv, rbc_send)
        commits, epk, B = pickle.loads(blob)
        # A Byzantine dealer could RBC an oversized or inconsistent batch;
        # every honest party applies the same recoverability bound.
        if B != len(commits) or B > 2 * self.t + 1:
            raise ValueError(
                f"HbAvssBatch: dealer {dealer_id} broadcast invalid batch"
                f" size {B} (commits={len(commits)}, 2t+1={2 * self.t + 1})")

        avid_tag = f"{dealer_id}-{avss_id}-B-AVID"
        avid_send, avid_recv = self._mk(avid_tag)
        avid = AVID(self.n, self.t, dealer_id, avid_recv, avid_send, self.n)
        disperse = asyncio.ensure_future(avid.disperse(
            avid_tag, self.my_id,
            avid_inputs if self.my_id == dealer_id else None))
        my_blob = await avid.retrieve(avid_tag, self.my_id)

        vote_tag = f"{dealer_id}-{avss_id}-B-VOTE"
        vote_send, vote_recv = self._mk(vote_tag)

        def vote_bcast(o):
            for dest in range(self.n):
                vote_send(dest, o)

        shared_key = epk ** self.sk
        shares = auxes = wits = None
        ok = False
        try:
            payload = symmetric.decrypt(shared_key, my_blob)
            ok = self.pc.batch_verify_eval(
                commits, self.my_id + 1,
                [ZR(s) for s, _, _ in payload],
                [ZR(a) for _, a, _ in payload],
                [w for _, _, w in payload])
            if ok:
                shares = [s for s, _, _ in payload]
                auxes = [a for _, a, _ in payload]
                wits = [w for _, _, w in payload]
        except ValueError:
            ok = False

        if ok:
            vote_bcast(("OK",))
        else:
            proof = _dleq_prove(self.g, self.pks[self.my_id], epk,
                                shared_key, self.sk)
            vote_bcast(("IMPLICATE", shared_key, proof))

        # The vote handler OUTLIVES this party's own output (exactly like
        # HbAvssLight above, reference hbavss.py keeps _process_avss_msg
        # running): honest parties must keep serving IMPLICATE/R1/R2
        # after they return, or a cheated party whose implicate arrives
        # late never recovers its shares.
        #
        # Share recovery is the reference's TWO-ROUND bivariate scheme
        # (hbavss.py:475-549), which reveals to each party only its own
        # "column" of the dealt batch: view share b of party i as
        # F(i+1, b) of a bivariate F, degree t in x, degree B-1 in y.
        #   R1  party i interpolates its ROW psi_i(y) = F(i+1, y) (and the
        #       aux/witness polynomials, the witness in the exponent) and
        #       sends party j ONLY psi_i(j) — verifiable against the
        #       commitment interpolated at batch-coordinate j.
        #   R2  after t+1 verified R1 values, party j interpolates its
        #       COLUMN at batch-coordinate j across senders and returns to
        #       each m that column's value at m — which is psi_m(j).
        #   out the victim interpolates its row from 2t+1 R2 values and
        #       reads its shares at y = 0..B-1. (Needs B <= 2t+1.)
        # A single-round broadcast of full (share, aux, witness) payloads
        # would instead make EVERY batch secret publicly interpolatable on
        # any implicate (see test_hbavss.py recovery-secrecy test).
        output = asyncio.Future()
        state = {"shares": shares, "ok": ok, "r1_sent": False,
                 "r2_sent": False}
        oks = set()
        interp_c = {}                      # my-column commitment (lazy)
        r1_vals: dict[int, int] = {}       # sender -> psi_sender(my_id)
        r2_vals: dict[int, int] = {}       # sender -> psi_my(sender)

        def my_column_commitment():
            if "c" not in interp_c:
                c_coords = [(b, commits[b]) for b in range(B)]
                interp_c["c"] = interpolate_g1_at_x(c_coords, self.my_id)
            return interp_c["c"]

        def send_r1():
            """Interpolate my row (share/aux/witness) over the batch
            coordinates and hand each party its single column value."""
            state["r1_sent"] = True
            phi_coords = [(b, self.field(shares[b])) for b in range(B)]
            aux_coords = [(b, self.field(int(auxes[b]))) for b in range(B)]
            w_coords = [(b, wits[b]) for b in range(B)]
            for j in range(self.n):
                vote_send(j, ("R1",
                              int(self.poly.interpolate_at(phi_coords, j)),
                              int(self.poly.interpolate_at(aux_coords, j)),
                              interpolate_g1_at_x(w_coords, j)))

        def maybe_send_r2():
            if state["r2_sent"] or len(r1_vals) < self.t + 1:
                return
            state["r2_sent"] = True
            coords = [(s, self.field(v)) for s, v in r1_vals.items()]
            for j in range(self.n):
                vote_send(j, ("R2",
                              int(self.poly.interpolate_at(coords, j))))

        async def handler():
            while True:
                sender, msg = await vote_recv()
                if msg[0] == "OK":
                    oks.add(sender)
                    if len(oks) >= 2 * self.t + 1 and \
                            state["shares"] is not None and not output.done():
                        output.set_result(state["shares"])
                elif msg[0] == "IMPLICATE" and not state["r1_sent"]:
                    _, their_key, proof = msg
                    if not _dleq_verify(self.g, self.pks[sender], epk,
                                        their_key, proof):
                        continue
                    try:
                        their_blob = await avid.retrieve(avid_tag, sender)
                        payload = symmetric.decrypt(their_key, their_blob)
                        valid = self.pc.batch_verify_eval(
                            commits, sender + 1,
                            [ZR(s) for s, _, _ in payload],
                            [ZR(a) for _, a, _ in payload],
                            [w for _, _, w in payload])
                    except (ValueError, TypeError):
                        valid = False
                    if not valid and state["ok"]:
                        send_r1()
                elif msg[0] == "R1":
                    _, phi_j, aux_j, w_j = msg
                    if self.pc.verify_eval(my_column_commitment(),
                                           sender + 1, ZR(phi_j),
                                           ZR(aux_j), w_j):
                        r1_vals[sender] = phi_j
                        maybe_send_r2()
                elif msg[0] == "R2":
                    r2_vals[sender] = msg[1]
                    if state["shares"] is None and \
                            len(r2_vals) >= 2 * self.t + 1:
                        coords = [(s, self.field(v))
                                  for s, v in r2_vals.items()]
                        state["shares"] = [
                            int(self.poly.interpolate_at(coords, b))
                            for b in range(B)]
                        vote_bcast(("OK",))

        task = asyncio.ensure_future(handler())
        task.add_done_callback(print_exception_callback)
        self._tasks.append(task)
        shares_out = await output
        # dispersal agreement necessarily completed before our retrieve()
        # resolved (ok_future gates it), so this await returns immediately —
        # and surfaces any error instead of leaking the task
        await disperse
        return shares_out
