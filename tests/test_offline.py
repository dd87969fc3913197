"""Offline phase: RanDouSha double sharings, triples, bits (mirrors
reference tests/test_offline_randousha.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.parallel.mesh import SimBackend
from honeybadgermpc_tpu.parallel.reconstruct import sim_batch_reconstruct
from honeybadgermpc_tpu.runtime.offline import (generate_bits,
                                                generate_triples, randousha)


def open_shares(shares, n, t):
    k = t + 1
    B = shares.shape[-1]
    pad = (-B) % k
    if pad:
        shares = FpArray.concatenate(
            [shares, FpArray.zeros(shares.shape[:-1] + (pad,))],
            axis=shares.ndim - 1)
    vals, nerr = sim_batch_reconstruct(shares, n, t)
    return FpArray(vals.limbs[..., :B]), nerr


@pytest.mark.parametrize("n,t", [(4, 1), (7, 2)])
def test_randousha_double_sharings(n, t):
    k = 3
    be = SimBackend(n)
    r_t, r_2t, ok = randousha(be, n, t, k, jax.random.PRNGKey(1))
    assert bool(ok)
    assert r_t.shape == (n, k * (n - 2 * t))
    v1, e1 = open_shares(r_t, n, t)
    v2, e2 = open_shares(r_2t, n, 2 * t)
    assert int(np.asarray(e1).sum()) == 0 and int(np.asarray(e2).sum()) == 0
    # same secrets at both degrees, and actually random (distinct)
    a, b = v1.to_ints()[0], v2.to_ints()[0]
    assert list(a) == list(b)
    assert len(set(a)) == len(a)


def test_generate_triples(rng):
    n, t, k = 4, 1, 4
    be = SimBackend(n)
    a, b, ab, ok = generate_triples(be, n, t, k, jax.random.PRNGKey(2))
    assert bool(ok)
    va, _ = open_shares(a, n, t)
    vb, _ = open_shares(b, n, t)
    vab, _ = open_shares(ab, n, t)
    for x, y, xy in zip(va.to_ints()[0], vb.to_ints()[0], vab.to_ints()[0]):
        assert x * y % P == xy


def test_generate_bits():
    n, t, k = 4, 1, 8
    be = SimBackend(n)
    bits, ok = generate_bits(be, n, t, k, jax.random.PRNGKey(3))
    assert bool(ok)
    v, _ = open_shares(bits, n, t)
    vals = v.to_ints()[0]
    assert all(x in (0, 1) for x in vals)
    assert len(set(vals)) == 2  # both values appear w.h.p. over 16 bits


def test_randousha_detects_bad_dealer():
    """A dealer sending an inconsistent (t vs 2t secrets differ) sharing
    must flip the abort flag (H2/H3 checking, offline_randousha.py:105-146)."""
    n, t, k = 4, 1, 2
    be = SimBackend(n)

    import honeybadgermpc_tpu.runtime.offline as off
    orig = off._deal_own
    calls = {}

    def evil(enc, secrets, degree, key):
        out = orig(enc, secrets, degree, key)
        if degree == 2 * t:
            # dealer 0 shares different secrets at 2t
            bump = FpArray.from_int(1)
            out = out.at_set((0,), FpArray(out.limbs[:, 0]) + bump)
        return out

    off._deal_own = evil
    try:
        _, _, ok = off.randousha(be, n, t, k, jax.random.PRNGKey(4))
    finally:
        off._deal_own = orig
    assert not bool(ok)


def test_sim_offline_jit_detect_only():
    """The one-shot compiled offline program (detect-only opens by
    default: decode faults flip ok instead of compiling in-graph Gao)
    still produces valid triples fault-free."""
    from honeybadgermpc_tpu.runtime.offline import sim_offline_jit
    n, t, k = 4, 1, 4
    f = sim_offline_jit("generate_triples", n, t, k)
    a, b, ab, ok = f(jax.random.PRNGKey(9))
    assert bool(ok)
    va, _ = open_shares(a, n, t)
    vb, _ = open_shares(b, n, t)
    vab, _ = open_shares(ab, n, t)
    for x, y, xy in zip(va.to_ints()[0], vb.to_ints()[0], vab.to_ints()[0]):
        assert x * y % P == xy
