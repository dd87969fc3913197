"""Polynomial commitments, symmetric crypto, AVID dispersal (mirrors
reference tests/test_avid.py and poly-commit usage in tests/test_hbavss.py)."""

import asyncio

import pytest

from honeybadgermpc_tpu.betterpairing import G1, ZR
from honeybadgermpc_tpu.crypto import symmetric
from honeybadgermpc_tpu.crypto.poly_commit_const import (PolyCommitConst,
                                                         eval_poly,
                                                         gen_pc_const_crs)
from honeybadgermpc_tpu.crypto.poly_commit_lin import PolyCommitLin
from honeybadgermpc_tpu.protocols.avid import AVID
from honeybadgermpc_tpu.protocols.router import TestRouter


def test_poly_commit_lin():
    pc = PolyCommitLin()
    phi = [ZR(5), ZR(7), ZR(11)]
    cs, aux = pc.commit(phi)
    for i in (1, 2, 5):
        w = pc.create_witness(aux, i)
        y = eval_poly(phi, i)
        assert pc.verify_eval(cs, i, y, w)
        assert not pc.verify_eval(cs, i, y + ZR(1), w)


def test_poly_commit_const_kzg():
    t = 2
    crs = gen_pc_const_crs(t, seed=9)
    pc = PolyCommitConst(crs)
    phi = [ZR(3), ZR(1), ZR(4)]
    c, phi_hat = pc.commit(phi)
    for i in (1, 3):
        w = pc.create_witness(phi, phi_hat, i)
        assert pc.verify_eval(c, i, eval_poly(phi, i), eval_poly(phi_hat, i), w)
        assert not pc.verify_eval(c, i, eval_poly(phi, i) + ZR(2),
                                  eval_poly(phi_hat, i), w)


def test_poly_commit_const_batch():
    t = 1
    crs = gen_pc_const_crs(t, seed=10)
    pc = PolyCommitConst(crs)
    polys = [[ZR(2), ZR(9)], [ZR(8), ZR(1)]]
    commits, hats, shares, auxes, wits = [], [], [], [], []
    i = 3
    for phi in polys:
        c, ph = pc.commit(phi)
        commits.append(c)
        hats.append(ph)
        shares.append(eval_poly(phi, i))
        auxes.append(eval_poly(ph, i))
        wits.append(pc.create_witness(phi, ph, i))
    assert pc.batch_verify_eval(commits, i, shares, auxes, wits)
    shares[0] = shares[0] + ZR(1)
    assert not pc.batch_verify_eval(commits, i, shares, auxes, wits)


def test_symmetric_roundtrip_and_tamper():
    key = G1.rand(4)
    obj = {"share": 123, "witness": [1, 2, 3]}
    blob = symmetric.encrypt(key, obj)
    assert symmetric.decrypt(key, blob) == obj
    tampered = blob[:-1] + bytes([blob[-1] ^ 1])
    with pytest.raises(ValueError):
        symmetric.decrypt(key, tampered)
    with pytest.raises(ValueError):
        symmetric.decrypt(G1.rand(5), blob)


def test_avid_disperse_retrieve():
    n, f = 4, 1

    async def run():
        router = TestRouter(n, seed=2)
        payloads = [f"payload-{i}".encode() * 5 for i in range(n)]
        avids = [AVID(n, f, 0, router.recvs[i], router.sends[i], n)
                 for i in range(n)]

        async def party(i):
            if i == 0:
                await avids[i].disperse("sid", i, payloads)
            else:
                await avids[i].disperse("sid", i)
            # each party retrieves its own index
            return await avids[i].retrieve("sid", i)

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 60)
        for i in range(n):
            assert outs[i] == payloads[i], i
        for a in avids:
            a.kill()

    asyncio.run(run())


def test_avid_byzantine_leader_cross_party_retrieve():
    """A Byzantine leader sends party 2 corrupted VAL stripes. Dispersal
    still completes via the READY quorum of the other parties, and EVERY
    party — including the cheated one, whose own stripes are useless —
    retrieves ANOTHER party's payload from the t+1 honest responders
    (reference avid.py:67-121 retrieval guarantees)."""
    n, f = 4, 1
    victim = 2

    async def run():
        router = TestRouter(n, seed=21)
        payloads = [f"payload-{i}".encode() * 5 for i in range(n)]

        def evil_send(dest, msg):
            if msg[0] == "VAL" and dest == victim:
                roots, payload = msg[1], msg[2]
                bad = [(b"\x00" * len(s), br) for s, br in payload]
                msg = ("VAL", roots, bad)
            router.sends[0](dest, msg)

        avids = [AVID(n, f, 0, router.recvs[i],
                      evil_send if i == 0 else router.sends[i], n)
                 for i in range(n)]

        async def party(i):
            disp = asyncio.ensure_future(avids[i].disperse(
                "sid", i, payloads if i == 0 else None))
            cross = await avids[i].retrieve("sid", 1)   # another party's
            own = await avids[i].retrieve("sid", i)
            await disp
            return cross, own

        outs = await asyncio.wait_for(
            asyncio.gather(*[party(i) for i in range(n)]), 60)
        for a in avids:
            a.kill()
        return outs

    outs = asyncio.run(run())
    for i, (cross, own) in enumerate(outs):
        assert cross == f"payload-1".encode() * 5, i
        assert own == f"payload-{i}".encode() * 5, i
