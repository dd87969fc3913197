"""Batch reconstruction end-to-end: simulated n-party network and real
shard_map over the 8-device CPU mesh (mirrors reference
tests/test_batch_reconstruction.py incl. fault grids)."""

import jax
import numpy as np
import pytest

from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.ops.rs import Encoding
from honeybadgermpc_tpu.parallel.mesh import MeshBackend, SimBackend, party_mesh
from honeybadgermpc_tpu.parallel.reconstruct import (batch_reconstruct,
                                                     inject_share_faults,
                                                     make_sharded_reconstruct,
                                                     robust_open_single)


def deal(rng, enc, t, B):
    """Dealer: B random secrets -> shares[n, B] (degree t)."""
    secrets = [rng.randrange(P) for _ in range(B)]
    coeffs = [[s] + [rng.randrange(P) for _ in range(t)] for s in secrets]
    sh = enc.encode(FpArray.from_ints(coeffs))        # [B, n]
    return secrets, sh.transpose((1, 0))              # [n, B]


@pytest.mark.parametrize("n,t", [(4, 1), (7, 2)])
@pytest.mark.parametrize("use_fft", [
    False, pytest.param(True, marks=pytest.mark.slow)])
def test_sim_batch_reconstruct_faultfree(rng, n, t, use_fft):
    B = 4 * (t + 1)
    enc = Encoding(n, use_omega_powers=use_fft)
    secrets, shares = deal(rng, enc, t, B)
    backend = SimBackend(n)
    got, nerr = batch_reconstruct(backend, shares, n, t,
                                  use_omega_powers=use_fft)
    assert np.asarray(nerr).tolist() == [0] * n
    out = got.to_ints()
    for j in range(n):
        assert list(out[j]) == secrets


@pytest.mark.parametrize("n,t,bad", [(4, 1, [2]), (7, 2, [0, 5])])
def test_sim_batch_reconstruct_with_faults(rng, n, t, bad):
    B = 2 * (t + 1)
    enc = Encoding(n)
    secrets, shares = deal(rng, enc, t, B)
    backend = SimBackend(n)
    ids = backend.my_ids()
    faulty = inject_share_faults(shares, ids, bad, jax.random.PRNGKey(3))
    got, nerr = batch_reconstruct(backend, faulty, n, t)
    out = got.to_ints()
    for j in range(n):
        assert list(out[j]) == secrets, f"party {j}"
    # at least one party observed errors
    assert int(np.asarray(nerr).sum()) > 0


def test_robust_open_single(rng):
    n, t, S = 7, 2, 3
    enc = Encoding(n)
    secrets, shares = deal(rng, enc, t, S)
    backend = SimBackend(n)
    got, _ = robust_open_single(backend, shares, n, t)
    for j in range(n):
        assert list(got.to_ints()[j]) == secrets


def test_sharded_reconstruct_matches_sim(rng):
    n, t = 4, 1
    B = 4 * (t + 1)
    enc = Encoding(n)
    secrets, shares = deal(rng, enc, t, B)
    mesh = party_mesh(n)
    run = make_sharded_reconstruct(mesh, n, t)
    got, nerr = run(shares)
    out = got.to_ints()
    for j in range(n):
        assert list(out[j]) == secrets
    assert np.asarray(nerr).tolist() == [0] * n


def test_sharded_reconstruct_with_faults(rng):
    n, t = 4, 1
    B = 2 * (t + 1)
    enc = Encoding(n)
    secrets, shares = deal(rng, enc, t, B)
    ids = SimBackend(n).my_ids()
    faulty = inject_share_faults(shares, ids, [1], jax.random.PRNGKey(7))
    mesh = party_mesh(n)
    run = make_sharded_reconstruct(mesh, n, t)
    got, nerr = run(faulty)
    for j in range(n):
        assert list(got.to_ints()[j]) == secrets
    assert int(np.asarray(nerr).sum()) > 0


@pytest.mark.parametrize("ndev", [2, 8])
def test_hybrid_reconstruct_matches_sim(rng, ndev):
    """n=16 parties over 2/8 devices (8/2 simulated parties per device,
    HybridBackend) opens bit-exactly — the deployment shape where the
    party count exceeds the chip count (BASELINE 2-host scaling target's
    rehearsal path)."""
    from honeybadgermpc_tpu.parallel.mesh import device_mesh
    from honeybadgermpc_tpu.parallel.reconstruct import make_hybrid_reconstruct

    n, t = 16, 5
    B = 2 * (t + 1)
    enc = Encoding(n)
    secrets, shares = deal(rng, enc, t, B)
    run = make_hybrid_reconstruct(device_mesh(ndev), n, t)
    got, nerr = run(shares)
    out = got.to_ints()
    for j in range(n):
        assert list(out[j]) == secrets
    assert np.asarray(nerr).tolist() == [0] * n


def test_hybrid_reconstruct_with_faults(rng):
    """Fault correction across device boundaries: a faulty simulated party
    on one device is corrected by honest parties on the others."""
    from honeybadgermpc_tpu.parallel.mesh import device_mesh
    from honeybadgermpc_tpu.parallel.reconstruct import make_hybrid_reconstruct

    n, t = 8, 2
    B = t + 1
    enc = Encoding(n)
    secrets, shares = deal(rng, enc, t, B)
    ids = SimBackend(n).my_ids()
    faulty = inject_share_faults(shares, ids, [3], jax.random.PRNGKey(9))
    run = make_hybrid_reconstruct(device_mesh(4), n, t)
    got, nerr = run(faulty)
    for j in range(n):
        assert list(got.to_ints()[j]) == secrets
    assert int(np.asarray(nerr).sum()) > 0


def test_sharded_randousha_verifies(rng):
    """The RanDouSha offline program under shard_map over an 8-device
    'parties' mesh (ICI collectives): outputs are consistent degree-t and
    degree-2t sharings of EQUAL secrets, verification passes."""
    from honeybadgermpc_tpu.polynomial import polynomials_over
    from honeybadgermpc_tpu.field import GF
    from honeybadgermpc_tpu.runtime.offline import sharded_offline_jit

    n, t, k = 8, 2, 2
    mesh = party_mesh(n)
    run = sharded_offline_jit("randousha", mesh, n, t, k)
    r_t, r_2t, ok = run(jax.random.PRNGKey(5))
    assert np.asarray(ok).all()
    m = k * (n - 2 * t)
    assert r_t.shape == (n, m) and r_2t.shape == (n, m)
    poly = polynomials_over(GF(P))
    vt = r_t.to_ints()
    v2t = r_2t.to_ints()
    for c in range(m):
        # interpolate r_t from t+1 shares, r_2t from 2t+1; equal secrets,
        # and full-degree consistency (all n points on the curve)
        pts_t = [(j + 1, int(vt[j][c])) for j in range(n)]
        pts_2 = [(j + 1, int(v2t[j][c])) for j in range(n)]
        s1 = int(poly.interpolate_at(pts_t[:t + 1], 0))
        s2 = int(poly.interpolate_at(pts_2[:2 * t + 1], 0))
        assert s1 == s2
        f_t = poly.interpolate(pts_t)
        assert all(int(f_t(x)) == y for x, y in pts_t)   # degree <= t... n-1
        assert len([co for co in f_t.coeffs[t + 1:] if int(co)]) == 0


def test_sharded_triples_verify(rng):
    """generate_triples under shard_map: a*b == ab on opened values."""
    from honeybadgermpc_tpu.polynomial import polynomials_over
    from honeybadgermpc_tpu.field import GF
    from honeybadgermpc_tpu.runtime.offline import sharded_offline_jit

    n, t, k = 4, 1, 2
    mesh = party_mesh(n)
    run = sharded_offline_jit("generate_triples", mesh, n, t, k)
    a, b, ab, ok = run(jax.random.PRNGKey(11))
    assert np.asarray(ok).all()
    poly = polynomials_over(GF(P))
    va, vb, vab = a.to_ints(), b.to_ints(), ab.to_ints()
    for c in range(a.shape[-1]):
        ia = int(poly.interpolate_at(
            [(j + 1, int(va[j][c])) for j in range(t + 1)], 0))
        ib = int(poly.interpolate_at(
            [(j + 1, int(vb[j][c])) for j in range(t + 1)], 0))
        iab = int(poly.interpolate_at(
            [(j + 1, int(vab[j][c])) for j in range(t + 1)], 0))
        assert ia * ib % P == iab


def test_host_robust_redo(rng):
    """The host-driven segment-wise Gao redo (the TPU two-phase robust
    path's phase 2) corrects injected faults bit-exactly."""
    from honeybadgermpc_tpu.parallel.reconstruct import host_robust_redo
    n, t = 7, 2
    B = 3 * (t + 1)
    enc = Encoding(n)
    secrets, shares = deal(rng, enc, t, B)
    ids = SimBackend(n).my_ids()
    faulty = inject_share_faults(shares, ids, [2], jax.random.PRNGKey(3))
    sec_np, nerr = host_robust_redo(
        np.asarray(jax.device_get(faulty.limbs)), n, t)
    got = FpArray(jax.device_put(sec_np))
    for j in range(n):
        assert list(got.to_ints()[j]) == secrets
    assert nerr.sum() > 0
    # tiny-segment path: force multiple segments
    import honeybadgermpc_tpu.parallel.reconstruct as rec
    old = rec._REDO_SEG
    try:
        rec._REDO_SEG = 4                   # n*C = 21 instances -> 6 segs
        sec_np2, nerr2 = host_robust_redo(
            np.asarray(jax.device_get(faulty.limbs)), n, t)
        assert np.array_equal(sec_np, sec_np2)
        assert np.array_equal(nerr, nerr2)
    finally:
        rec._REDO_SEG = old
