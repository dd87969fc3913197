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


@pytest.mark.slow
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


@pytest.mark.slow
def test_packed4_finish_kernels_parity(rng):
    """SLOW tier: ~10 min interpret-kernel compile each on this image's
    XLA:CPU (cached thereafter); runs in seconds on TPU.
    The 4D-native packed finish kernels (mul_add_packed4,
    sub_bcast_packed4 — the generate_triples_packed bench path) match the
    Python-int oracle on their native [PL, n, R, S] layout, including the
    grid-index-map broadcast of the shared minuend."""
    import jax as _jax
    import numpy as _np

    from honeybadgermpc_tpu.ops.fused_open import pack_limbs, unpack_limbs
    from honeybadgermpc_tpu.ops.limbs import (R_MOD_P, ints_to_limbs,
                                              limbs_to_ints)
    from honeybadgermpc_tpu.ops.pallas_field import (mul_add_packed4,
                                                     sub_bcast_packed4)

    n, R, S = 3, 8, 128
    shape = (n, R, S)

    def draw():
        return _np.array([[[rng.randrange(P) for _ in range(S)]
                           for _ in range(R)] for _ in range(n)], object)

    av, bv, cv = draw(), draw(), draw()
    pk = [pack_limbs(jnp.asarray(ints_to_limbs(v)))
          for v in (av, bv, cv)]
    z = mul_add_packed4(*pk)
    got = limbs_to_ints(_np.asarray(_jax.device_get(unpack_limbs(z))))
    rinv = pow(R_MOD_P, P - 2, P)
    for idx in _np.ndindex(shape):
        aa = int(av[idx]) * rinv % P
        bb = int(bv[idx]) * rinv % P
        want = (aa * bb % P * R_MOD_P + int(cv[idx])) % P
        assert int(got[idx]) == want, idx

    # broadcast subtract: shared minuend [PL, R, S] minus per-party b
    mv = _np.array([[rng.randrange(P) for _ in range(S)]
                    for _ in range(R)], object)
    mk = pack_limbs(jnp.asarray(ints_to_limbs(mv)))
    d = sub_bcast_packed4(mk, pk[1])
    gotd = limbs_to_ints(_np.asarray(_jax.device_get(unpack_limbs(d))))
    for idx in _np.ndindex(shape):
        want = (int(mv[idx[1:]]) - int(bv[idx])) % P
        assert int(gotd[idx]) == want, idx


@pytest.mark.slow
def test_fused_triples_packed_parity():
    """END-TO-END packed/padded pipeline parity (generate_triples_packed —
    the bench path: 4D-native finish kernels, rho-folded extraction)
    against the unpacked FpArray path on the same key, with the real
    triples as rows [:n-2t] of the padded column axis. SLOW tier: on the
    forced-CPU test backend the eager interpret-mode pipelines take tens
    of minutes to compile; on a TPU backend this runs in ~2 min (verified
    bit-exact on the real chip, r05)."""
    import jax as _jax
    import numpy as _np

    from honeybadgermpc_tpu.ops.fused_open import unpack_limbs
    from honeybadgermpc_tpu.parallel.mesh import SimBackend
    from honeybadgermpc_tpu.runtime.offline import fused_generate_triples

    n, t, k = 8, 2, 128
    n_out = n - 2 * t
    key = _jax.random.PRNGKey(11)
    a, b, ab, ok = fused_generate_triples(SimBackend(n), n, t, k, key)
    pa, pb, pab, okp = fused_generate_triples(SimBackend(n), n, t, k, key,
                                              packed=True)
    assert bool(_jax.device_get(ok)) and bool(_jax.device_get(okp))

    def unpack4(p4):
        # [PL, n, n_outp, k] -> FpArray limbs [L, n, n_out*k]
        lim = unpack_limbs(p4[:, :, :n_out])
        return lim.reshape(lim.shape[:2] + (n_out * k,))

    for flat, padded, name in ((a, pa, "a"), (b, pb, "b"), (ab, pab, "ab")):
        got = _np.asarray(_jax.device_get(unpack4(padded)))
        want = _np.asarray(_jax.device_get(flat.limbs))
        _np.testing.assert_array_equal(got, want, err_msg=name)
