"""Fused 3-kernel batch open (ops/fused_open.py): bit-exact parity of the
balanced base-256 digit scheme against dealer secrets, fault-free and with
injected faults (robust fallback), run under Pallas interpret mode on CPU.

Mirrors the reference's batch-opening correctness grid
(tests/test_batch_reconstruction.py in initc3/HoneyBadgerMPC) at the fused
kernels' native granularity.
"""

import random

import jax
import numpy as np
import pytest

from honeybadgermpc_tpu.ops import montgomery as mont
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.fused_open import (pack_limbs, sim_open_fused,
                                               unpack_limbs)
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.ops.rs import Encoding
from honeybadgermpc_tpu.parallel.mesh import SimBackend
from honeybadgermpc_tpu.parallel.reconstruct import inject_share_faults


def _deal(rng, n, t, B):
    enc = Encoding(n)
    secrets = [rng.randrange(P) for _ in range(B)]
    coeffs = [[s] + [rng.randrange(P) for _ in range(t)] for s in secrets]
    shares = enc.encode(FpArray.from_ints(coeffs)).transpose((1, 0))
    points = tuple(int(x) % mont.P for x in enc.points)
    return secrets, shares, points


@pytest.mark.parametrize("n,t", [(8, 2), (16, 5)])
def test_fused_open_faultfree(n, t):
    rng = random.Random(100 + n)
    B = 2 * (t + 1)
    secrets, shares, points = _deal(rng, n, t, B)
    packed, nerr = jax.jit(
        lambda l: sim_open_fused(l, n, t, points, robust=False))(shares.limbs)
    assert np.asarray(nerr).tolist() == [0] * n
    got = FpArray(unpack_limbs(packed)).to_ints()
    for j in range(n):
        assert list(got[j]) == secrets


def test_fused_open_wide_k():
    """k > 32 (degree-2t openings) exercises the dynamic-bias balanced
    scheme and K3's halved dst grouping (jt3=4, padded errs rows)."""
    n, deg = 48, 35
    rng = random.Random(900)
    k = deg + 1
    B = 2 * k
    secrets, shares, points = _deal(rng, n, deg, B)
    packed, nerr = jax.jit(
        lambda l: sim_open_fused(l, n, deg, points, robust=False))(
            shares.limbs)
    assert np.asarray(nerr).tolist() == [0] * n
    got = FpArray(unpack_limbs(packed)).to_ints()
    for j in range(n):
        assert list(got[j]) == secrets


def test_fused_open_robust_fallback():
    n, t = 8, 2
    rng = random.Random(7)
    B = 2 * (t + 1)
    secrets, shares, points = _deal(rng, n, t, B)
    faulty = inject_share_faults(shares, SimBackend(n).my_ids(), [3],
                                 jax.random.PRNGKey(7))
    packed, nerr = jax.jit(
        lambda l: sim_open_fused(l, n, t, points, robust=True))(faulty.limbs)
    assert int(np.asarray(nerr).sum()) > 0
    got = FpArray(unpack_limbs(packed)).to_ints()
    for j in range(n):
        assert list(got[j]) == secrets


def test_pack_unpack_roundtrip():
    rng = random.Random(3)
    vals = [rng.randrange(P) for _ in range(16)]
    limbs = FpArray.from_ints(vals).limbs
    rt = unpack_limbs(pack_limbs(limbs))
    assert np.array_equal(np.asarray(rt), np.asarray(limbs))


@pytest.mark.parametrize("n,t", [(8, 2), (16, 5)])
def test_direct_open_bitexact(n, t):
    """The single-kernel direct-composition open (ops/fused_open_direct.py)
    must produce bit-identical secrets to the three-kernel pipeline and
    report zero mismatches on honest shares."""
    from honeybadgermpc_tpu.ops.fused_open_direct import (
        direct_fits, sim_open_direct_packed)
    assert direct_fits(n, t + 1)
    rng = random.Random(40 + n)
    B = 3 * (t + 1)
    secrets, shares, points = _deal(rng, n, t, B)
    packed = jax.jit(pack_limbs)(shares.limbs)
    s_fused, e_fused = jax.jit(
        lambda p: __import__(
            "honeybadgermpc_tpu.ops.fused_open", fromlist=["x"]
        ).sim_open_fused_packed(p, n, t, points, robust=False))(packed)
    s_direct, e_direct = jax.jit(
        lambda p: sim_open_direct_packed(p, n, t, points))(packed)
    assert np.asarray(e_fused).sum() == 0
    assert np.asarray(e_direct).sum() == 0
    assert np.array_equal(np.asarray(s_fused), np.asarray(s_direct))
    got = FpArray(unpack_limbs(s_direct)).to_ints()
    for j in range(n):
        assert list(got[j]) == secrets


def test_direct_open_single_copy_matches_replicated():
    """replicate=False returns ONE secrets copy bit-identical to any
    party's slice of the replicated view (the bench's low-traffic mode)."""
    from honeybadgermpc_tpu.ops.fused_open_direct import \
        sim_open_direct_packed
    n, t = 8, 2
    rng = random.Random(59)
    B = 3 * (t + 1)
    secrets, shares, points = _deal(rng, n, t, B)
    packed = jax.jit(pack_limbs)(shares.limbs)
    s_rep, e_rep = jax.jit(
        lambda p: sim_open_direct_packed(p, n, t, points))(packed)
    s_one, e_one = jax.jit(
        lambda p: sim_open_direct_packed(p, n, t, points,
                                         replicate=False))(packed)
    assert np.array_equal(np.asarray(e_rep), np.asarray(e_one))
    assert s_one.shape == (s_rep.shape[0], B)
    assert np.array_equal(np.asarray(s_rep)[:, 0], np.asarray(s_one))
    got = FpArray(unpack_limbs(s_one[:, None])).to_ints()
    assert list(got[0]) == secrets


def test_direct_open_detects_faults():
    """Accept/reject parity: any share off the degree-t polynomial trips
    both the faithful validation and the direct predicate."""
    from honeybadgermpc_tpu.ops.fused_open import sim_open_fused_packed
    from honeybadgermpc_tpu.ops.fused_open_direct import \
        sim_open_direct_packed
    n, t = 8, 2
    rng = random.Random(77)
    B = 2 * (t + 1)
    _, shares, points = _deal(rng, n, t, B)
    packed = np.asarray(jax.device_get(jax.jit(pack_limbs)(shares.limbs)))
    for party, word, b in [(n - 1, 0, 3), (4, 7, 0), (0, 3, 5)]:
        bad = packed.copy()
        bad[word, party, b] ^= 0x2482
        _, e_fused = jax.jit(
            lambda p: sim_open_fused_packed(p, n, t, points,
                                            robust=False))(bad)
        _, e_direct = jax.jit(
            lambda p: sim_open_direct_packed(p, n, t, points))(bad)
        if party >= t + 1:
            # direct charges the offending source party
            assert int(np.asarray(e_direct)[party]) > 0
        assert (np.asarray(e_fused).sum() > 0) == \
            (np.asarray(e_direct).sum() > 0) == True  # noqa: E712


def test_direct_open_robust_fallback():
    """robust=True direct open: faults trip the in-graph lax.cond and the
    generic Gao path corrects them (for opens under an enclosing jit)."""
    from honeybadgermpc_tpu.ops.fused_open_direct import \
        sim_open_direct_packed
    n, t = 8, 2
    rng = random.Random(19)
    B = 2 * (t + 1)
    secrets, shares, points = _deal(rng, n, t, B)
    faulty = inject_share_faults(shares, SimBackend(n).my_ids(), [5],
                                 jax.random.PRNGKey(5))
    packed = jax.jit(pack_limbs)(faulty.limbs)
    sec, nerr = jax.jit(
        lambda p: sim_open_direct_packed(p, n, t, points, robust=True))(
            packed)
    assert int(np.asarray(nerr).sum()) > 0
    got = FpArray(unpack_limbs(sec)).to_ints()
    for j in range(n):
        assert list(got[j]) == secrets


@pytest.mark.parametrize("n,t", [(4, 1), (7, 2)])
def test_direct_open_reference_grid_configs(n, t):
    """The reference's own batch-opening benchmark grid (n,t) in
    {(4,1),(7,2)} (benchmark/test_benchmark_batch_opening.py:4-16) decodes
    on the direct kernel — no party-count alignment constraint."""
    from honeybadgermpc_tpu.ops.fused_open_direct import (
        direct_fits, sim_open_direct_packed)
    assert direct_fits(n, t + 1)
    rng = random.Random(50 + n)
    B = 4 * (t + 1)
    secrets, shares, points = _deal(rng, n, t, B)
    packed = jax.jit(pack_limbs)(shares.limbs)
    sec, nerr = jax.jit(
        lambda p: sim_open_direct_packed(p, n, t, points))(packed)
    assert np.asarray(nerr).sum() == 0
    got = FpArray(unpack_limbs(sec)).to_ints()
    for j in range(n):
        assert list(got[j]) == secrets


def test_direct_open_padded_mg_wide_k():
    """k = 43 (the n=64 degree-2t opening) exceeds the single-group lane
    budget and has no multiple-of-8 divisor: the m axis is zero-padded to
    kp = MG*mg (ops/fused_open_direct._pick_cfg). Secrets and the
    accept/reject verdict must be unaffected."""
    from honeybadgermpc_tpu.ops.fused_open_direct import (
        _pick_cfg, direct_fits, sim_open_direct_packed)
    n, t = 64, 42
    k = t + 1
    assert direct_fits(n, k)
    MG, mg, kp = _pick_cfg(n, k)
    assert kp > k and kp == MG * mg, (MG, mg, kp)
    rng = random.Random(43)
    B = 2 * k
    secrets, shares, points = _deal(rng, n, t, B)
    packed = jax.jit(pack_limbs)(shares.limbs)
    sec, nerr = jax.jit(
        lambda p: sim_open_direct_packed(p, n, t, points,
                                         replicate=False))(packed)
    assert np.asarray(nerr).sum() == 0
    got = FpArray(unpack_limbs(sec)).to_ints()
    assert list(got) == secrets

    # a corrupted share must still flip the verdict through the padding
    bad = shares.limbs.at[0, n - 1, 3].add(1)
    _, nerr2 = jax.jit(
        lambda p: sim_open_direct_packed(p, n, t, points,
                                         replicate=False))(
        jax.jit(pack_limbs)(bad))
    assert np.asarray(nerr2).sum() > 0
