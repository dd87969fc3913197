"""Fused RanDouSha kernel pipeline (ops/fused_randousha.py): protocol
invariants on the CPU interpret path (mirrors reference
tests/test_offline_randousha.py's double-sharing checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.fused_open import unpack_limbs
from honeybadgermpc_tpu.ops.fused_randousha import (fused_fits,
                                                    sim_randousha_fused)
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.parallel.reconstruct import sim_batch_reconstruct

N, T, K = 8, 2, 128


def _open(packed, n, deg):
    sh = FpArray(unpack_limbs(packed))
    kk = deg + 1
    B = sh.shape[-1]
    pad = (-B) % kk
    if pad:
        sh = FpArray.concatenate(
            [sh, FpArray.zeros((n, pad))], axis=1)
    vals, nerr = sim_batch_reconstruct(sh, n, deg)
    return (FpArray(vals.limbs[..., :B]).to_ints(),
            int(np.asarray(jax.device_get(nerr)).sum()))


def test_fused_randousha_double_sharings():
    kd = jnp.asarray([5, 6], jnp.uint32)
    r_t, r_2t, ok = sim_randousha_fused(kd, N, T, K)
    assert bool(ok)
    m = K * (N - 2 * T)
    assert r_t.shape == (8, N, m)
    v1, e1 = _open(r_t, N, T)
    v2, e2 = _open(r_2t, N, 2 * T)
    assert e1 == 0 and e2 == 0
    a, b = v1[0], v2[0]
    # same secrets at both degrees, every party agrees, all distinct
    assert list(a) == list(b)
    assert all(list(v1[i]) == list(a) for i in range(N))
    assert len(set(map(int, a))) == m
    assert all(0 <= int(x) < P for x in a)


def test_fused_randousha_detects_corruption():
    """A corrupted dealt column (Byzantine dealer / transmission fault on
    the wire analog) must flip ok via the H2/H3 check opens."""
    from honeybadgermpc_tpu.ops.fused_randousha import _randousha_calls
    from honeybadgermpc_tpu.ops.rs import Encoding
    enc = Encoding(N)
    points = tuple(int(x) % P for x in enc.points)
    run = _randousha_calls(N, T, K, points, aggregate=False)
    kd_t, kd_2, ke, kc_t, kc_2, e1w, e2w, enw, r1w, r2w = run.parts

    key = jnp.asarray([[5, 6]], jnp.uint32)
    cols_t = kd_t(key, e1w)
    cols_2t = kd_2(key, e2w)
    # flip one word of dealer 3's column to dst party 1, slot 17
    cols_t = cols_t.at[0, 0, 0, 3, 1, 17].add(jnp.uint32(1))
    keep_t, chk_t = ke(cols_t, enw)
    keep_2t, chk_2t = ke(cols_2t, enw)
    _, et = kc_t(chk_t, r1w)
    _, e2 = kc_2(chk_2t, r2w)
    # the corrupted receive perturbs party 1's extracted check shares ->
    # validation mismatches in the degree-t check opens
    assert int(np.asarray(jax.device_get(jnp.sum(et)))) > 0
    assert int(np.asarray(jax.device_get(jnp.sum(e2)))) == 0


def test_fused_randousha_key_determinism():
    kd = jnp.asarray([9, 1], jnp.uint32)
    a1 = np.asarray(jax.device_get(sim_randousha_fused(kd, N, T, K)[0]))
    a2 = np.asarray(jax.device_get(sim_randousha_fused(kd, N, T, K)[0]))
    assert np.array_equal(a1, a2)
    a3 = np.asarray(jax.device_get(sim_randousha_fused(
        jnp.asarray([9, 2], jnp.uint32), N, T, K)[0]))
    assert not np.array_equal(a1, a3)


def test_fused_fits():
    assert fused_fits(64, 21)
    assert fused_fits(8, 2)
    assert not fused_fits(7, 2)        # party count not a sublane multiple
    assert not fused_fits(128, 21)     # beyond the balanced-scheme bound


def test_fused_randousha_aggregate_detects_corruption():
    """The rho-weighted batched check (aggregate mode, the default) must
    also flag a corrupted dealt column."""
    from honeybadgermpc_tpu.ops.fused_randousha import (NBAL, TBW,
                                                        _randousha_calls,
                                                        _rho_band)
    from honeybadgermpc_tpu.ops.rs import Encoding
    from honeybadgermpc_tpu.parallel.reconstruct import \
        _sim_reconstruct_packed_jit
    enc = Encoding(N)
    points = tuple(int(x) % P for x in enc.points)
    run = _randousha_calls(N, T, K, points, aggregate=True)
    kd_t, kd_2, ke, _, _, e1w, e2w, enw, r1w, r2w = run.parts

    key = jnp.asarray([5, 6], jnp.uint32)
    cols_t = kd_t(key.reshape(1, 2), e1w)
    cols_t = cols_t.at[0, 0, 0, 3, 1, 17].add(jnp.uint32(1))
    ncheck = 2 * T
    rb = _rho_band(key, ncheck, NBAL * ncheck)
    _, z_t = ke(cols_t, enw, rb)
    kk = T + 1
    pad = (-K) % kk
    zp = jnp.concatenate(
        [z_t, jnp.zeros((8, N, pad), jnp.uint32)], axis=-1) if pad else z_t
    opener = _sim_reconstruct_packed_jit(N, T, False, True,
                                         fallback=False, replicate=False)
    _, nerr = opener(zp)
    assert int(np.asarray(jax.device_get(nerr)).sum()) > 0
