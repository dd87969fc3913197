"""HBAVSS dealing/receiving incl. implicate-recovery (mirrors reference
tests/test_hbavss.py:28-61 and faulty-dealer cases)."""

import asyncio
import pickle

import pytest

from honeybadgermpc_tpu.betterpairing import ZR
from honeybadgermpc_tpu.crypto.poly_commit_const import gen_pc_const_crs
from honeybadgermpc_tpu.crypto import symmetric
from honeybadgermpc_tpu.field import GF
from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.polynomial import polynomials_over
from honeybadgermpc_tpu.protocols.hbavss import (HbAvssBatch, HbAvssLight,
                                                 get_avss_params)
from honeybadgermpc_tpu.protocols.router import TestRouter

P = Subgroup.BLS12_381


def open_from_shares(shares, t):
    """Oracle: interpolate the secret from (x, share) pairs."""
    poly = polynomials_over(GF(P))
    return int(poly.interpolate_at(list(shares.items())[:t + 1], 0))


def test_hbavss_light_honest_dealer():
    n, t = 4, 1
    g, h, pks, sks = get_avss_params(n, t)
    secret = 42424242

    async def run():
        router = TestRouter(n, seed=1)
        instances = [HbAvssLight(pks, sks[i], g, h, n, t, i,
                                 router.sends[i], router.recvs[i])
                     for i in range(n)]

        async def party(i):
            v = await asyncio.wait_for(
                instances[i].avss(0, secret if i == 1 else None, dealer_id=1),
                60)
            return v

        shares = await asyncio.gather(*[party(i) for i in range(n)])
        for inst in instances:
            inst.kill()
        return shares

    shares = asyncio.run(run())
    rec = open_from_shares({i + 1: s for i, s in enumerate(shares)}, t)
    assert rec == secret


def test_hbavss_light_parallel():
    n, t = 4, 1
    g, h, pks, sks = get_avss_params(n, t)
    secrets = [7, 8, 9]

    async def run():
        router = TestRouter(n, seed=3)
        instances = [HbAvssLight(pks, sks[i], g, h, n, t, i,
                                 router.sends[i], router.recvs[i])
                     for i in range(n)]
        outs = await asyncio.wait_for(asyncio.gather(*[
            instances[i].avss_parallel(
                0, 3, secrets if i == 0 else None, dealer_id=0)
            for i in range(n)]), 120)
        for inst in instances:
            inst.kill()
        return outs

    outs = asyncio.run(run())
    for j, secret in enumerate(secrets):
        rec = open_from_shares({i + 1: outs[i][j] for i in range(n)}, t)
        assert rec == secret


def test_hbavss_light_cheating_dealer_recovery():
    """Dealer corrupts party 2's ciphertext: party 2 implicates, others
    recover, and party 2 still ends with a correct share."""
    n, t = 4, 1
    g, h, pks, sks = get_avss_params(n, t)
    secret = 1234567

    async def run():
        router = TestRouter(n, seed=5)
        instances = [HbAvssLight(pks, sks[i], g, h, n, t, i,
                                 router.sends[i], router.recvs[i])
                     for i in range(n)]

        evil = instances[0]
        orig = evil._dealer_msg

        def bad_dealer_msg(value):
            commitments, epk, z = pickle.loads(orig(value))
            z[2] = z[2][:-1] + bytes([z[2][-1] ^ 1])  # corrupt party 2 blob
            return pickle.dumps((commitments, epk, z))

        evil._dealer_msg = bad_dealer_msg

        async def party(i):
            return await asyncio.wait_for(
                instances[i].avss(0, secret if i == 0 else None, dealer_id=0),
                60)

        shares = await asyncio.gather(*[party(i) for i in range(n)])
        for inst in instances:
            inst.kill()
        return shares

    shares = asyncio.run(run())
    rec = open_from_shares({i + 1: s for i, s in enumerate(shares)}, t)
    assert rec == secret
    # all n shares consistent (party 2's recovered share included)
    rec2 = open_from_shares({i + 1: shares[i] for i in (1, 2)}, t)
    assert rec2 == secret


def test_hbavss_light_client_mode_external_dealer():
    """client_mode: the dealer is an EXTERNAL (n+1)-th node (id n) — it
    runs the RBC over n+1 parties, sends only VAL, returns None; the n
    regular parties still end with consistent shares of its secret
    (reference hbavss.py:269-305, reliablebroadcast.py:193-211)."""
    n, t = 4, 1
    g, h, pks, sks = get_avss_params(n, t)
    secret = 31337

    async def run():
        router = TestRouter(n + 1, seed=11)   # slot n = the external client
        instances = [HbAvssLight(pks, sks[i], g, h, n, t, i,
                                 router.sends[i], router.recvs[i])
                     for i in range(n)]
        # the dealer knows the parties' PUBLIC keys only; its own private
        # key is never used (it decrypts nothing, receives no share)
        dealer = HbAvssLight(pks, ZR(1), g, h, n, t, n,
                             router.sends[n], router.recvs[n])

        async def party(i):
            return await asyncio.wait_for(
                instances[i].avss(0, dealer_id=n, client_mode=True), 60)

        dealt = asyncio.create_task(
            dealer.avss(0, secret, dealer_id=n, client_mode=True))
        shares = await asyncio.gather(*[party(i) for i in range(n)])
        assert await asyncio.wait_for(dealt, 60) is None
        for inst in instances + [dealer]:
            inst.kill()
        return shares

    shares = asyncio.run(run())
    rec = open_from_shares({i + 1: s for i, s in enumerate(shares)}, t)
    assert rec == secret
    rec2 = open_from_shares({3: shares[2], 4: shares[3]}, t)
    assert rec2 == secret


def test_hbavss_batch_cheating_dealer_recovery(monkeypatch):
    """HbAvssBatch implicate -> recovery end-to-end (reference
    tests/test_hbavss.py:28-61 depth): the dealer corrupts party 2's
    encrypted AVID payload; party 2 IMPLICATEs with a DLEQ proof, honest
    parties verify by retrieving party 2's blob cross-party, enter
    RECOVERY, and party 2 interpolates t+1 verified shares — ending with
    CORRECT shares of every secret."""
    n, t = 4, 1
    victim = 2
    g, h, pks, sks = get_avss_params(n, t)
    crs = gen_pc_const_crs(t, g=g, h=h, seed=15)
    secrets = [44, 55]

    # the dealer's per-party payload encryptions happen in avss() in party
    # order; corrupt the victim's (3rd) one
    import honeybadgermpc_tpu.crypto.symmetric as sym
    calls = {"n": 0}
    orig_encrypt = sym.encrypt

    def bad_encrypt(key, obj):
        blob = orig_encrypt(key, obj)
        calls["n"] += 1
        if calls["n"] == victim + 1:
            blob = blob[:-1] + bytes([blob[-1] ^ 1])
        return blob

    monkeypatch.setattr(sym, "encrypt", bad_encrypt)

    async def run():
        router = TestRouter(n, seed=17)
        instances = [HbAvssBatch(pks, sks[i], crs, n, t, i,
                                 router.sends[i], router.recvs[i])
                     for i in range(n)]
        outs = await asyncio.wait_for(asyncio.gather(*[
            instances[i].avss(0, secrets if i == 0 else None, dealer_id=0)
            for i in range(n)]), 300)
        for inst in instances:
            inst.kill()
        return outs

    outs = asyncio.run(run())
    assert calls["n"] >= n  # the corruption actually happened
    for b, secret in enumerate(secrets):
        # consistency including the victim's RECOVERED share
        rec = open_from_shares({i + 1: outs[i][b] for i in range(n)}, t)
        assert rec == secret
        rec2 = open_from_shares(
            {victim + 1: outs[victim][b], 4: outs[3][b]}, t)
        assert rec2 == secret


def test_hbavss_batch():
    n, t = 4, 1
    g, h, pks, sks = get_avss_params(n, t)
    crs = gen_pc_const_crs(t, g=g, h=h, seed=7)
    secrets = [11, 22, 33]

    async def run():
        router = TestRouter(n, seed=9)
        instances = [HbAvssBatch(pks, sks[i], crs, n, t, i,
                                 router.sends[i], router.recvs[i])
                     for i in range(n)]
        outs = await asyncio.wait_for(asyncio.gather(*[
            instances[i].avss(0, secrets if i == 0 else None, dealer_id=0)
            for i in range(n)]), 180)
        for inst in instances:
            inst.kill()
        return outs

    outs = asyncio.run(run())
    for b, secret in enumerate(secrets):
        rec = open_from_shares({i + 1: outs[i][b] for i in range(n)}, t)
        assert rec == secret


def test_hbavss_batch_recovery_secrecy(monkeypatch):
    """VERDICT r03 #5: the two-round R1/R2 recovery (reference
    hbavss.py:475-549) reveals to each party only its own batch-coordinate
    COLUMN — a transcript observer who is not the victim sees fewer than
    t+1 shares of any secret in the recovery traffic addressed to it, so
    non-victim secrets stay non-interpolatable. (The r03 single-round
    broadcast of full payloads made every secret publicly interpolatable
    on any implicate.)"""
    n, t = 4, 1
    victim = 2
    g, h, pks, sks = get_avss_params(n, t)
    crs = gen_pc_const_crs(t, g=g, h=h, seed=15)
    secrets = [44, 55]
    B = len(secrets)

    import honeybadgermpc_tpu.crypto.symmetric as sym
    calls = {"n": 0}
    orig_encrypt = sym.encrypt

    def bad_encrypt(key, obj):
        blob = orig_encrypt(key, obj)
        calls["n"] += 1
        if calls["n"] == victim + 1:
            blob = blob[:-1] + bytes([blob[-1] ^ 1])
        return blob

    monkeypatch.setattr(sym, "encrypt", bad_encrypt)

    received = {i: [] for i in range(n)}       # dest -> recovery payloads

    async def run():
        router = TestRouter(n, seed=21)
        for i in range(n):
            orig = router.sends[i]

            def wrapped(dest, obj, orig=orig):
                if isinstance(obj, tuple) and len(obj) == 2 and \
                        isinstance(obj[0], str) and "-B-VOTE" in obj[0] and \
                        isinstance(obj[1], tuple) and obj[1][0] in ("R1", "R2"):
                    received[dest].append(obj[1])
                orig(dest, obj)

            router.sends[i] = wrapped
        instances = [HbAvssBatch(pks, sks[i], crs, n, t, i,
                                 router.sends[i], router.recvs[i])
                     for i in range(n)]
        outs = await asyncio.wait_for(asyncio.gather(*[
            instances[i].avss(0, secrets if i == 0 else None, dealer_id=0)
            for i in range(n)]), 300)
        for inst in instances:
            inst.kill()
        return outs

    outs = asyncio.run(run())
    # recovery actually ran and produced correct shares for the victim
    for b, secret in enumerate(secrets):
        assert open_from_shares({i + 1: outs[i][b] for i in range(n)},
                                t) == secret
    assert any(m[0] == "R1" for msgs in received.values() for m in msgs)

    # secrecy: the recovery traffic any single non-victim party received
    # contains at most t shares of each secret's row — never the t+1
    # needed to interpolate it (its own column coordinate excepted: for
    # observer o < B, column o IS batch element o by construction)
    for o in range(n):
        if o == victim:
            continue                          # the victim learns its row
        vals = set()
        for m in received[o]:
            vals.update(int(v) for v in m[1:] if isinstance(v, int))
        for b in range(B):
            if b == o:
                continue
            exposed = sum(1 for i in range(n) if int(outs[i][b]) in vals)
            assert exposed <= t, (o, b, exposed)


def test_hbavss_batch_oversize_rejected():
    """VERDICT r04 #4: B > 2t+1 is unrecoverable by the two-round R1/R2
    scheme (column polynomials have degree B-1 but only 2t+1 R2 points),
    so the dealer must refuse to deal it (reference hbavss.py:529-546
    operates under the same implicit bound)."""
    n, t = 4, 1
    g, h, pks, sks = get_avss_params(n, t)
    crs = gen_pc_const_crs(t, g=g, h=h, seed=21)
    oversize = list(range(1, 2 * t + 3))  # B = 2t+2
    assert len(oversize) == 2 * t + 2

    async def run():
        router = TestRouter(n, seed=5)
        inst = HbAvssBatch(pks, sks[0], crs, n, t, 0,
                           router.sends[0], router.recvs[0])
        try:
            with pytest.raises(ValueError, match="2t\\+1"):
                await asyncio.wait_for(
                    inst.avss(0, oversize, dealer_id=0), 30)
        finally:
            inst.kill()

    asyncio.run(run())

    # The boundary itself (B == 2t+1) still deals and reconstructs.
    secrets = list(range(7, 7 + 2 * t + 1))

    async def run_ok():
        router = TestRouter(n, seed=6)
        instances = [HbAvssBatch(pks, sks[i], crs, n, t, i,
                                 router.sends[i], router.recvs[i])
                     for i in range(n)]
        outs = await asyncio.wait_for(asyncio.gather(*[
            instances[i].avss(1, secrets if i == 0 else None, dealer_id=0)
            for i in range(n)]), 180)
        for inst in instances:
            inst.kill()
        return outs

    outs = asyncio.run(run_ok())
    for b, secret in enumerate(secrets):
        rec = open_from_shares({i + 1: outs[i][b] for i in range(n)}, t)
        assert rec == secret
