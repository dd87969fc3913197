"""Pallas kernel bit-exact parity vs the jnp Montgomery path (runs in
interpret mode on CPU; the same kernels compile natively on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from honeybadgermpc_tpu.ops import montgomery as mont
from honeybadgermpc_tpu.ops.limbs import P, R_MOD_P, ints_to_limbs, limbs_to_ints
from honeybadgermpc_tpu.ops.pallas_field import fp_matmul_pallas, mont_mul_pallas


def _mont_ints(rng, n):
    return [rng.randrange(P) * R_MOD_P % P for _ in range(n)]


def test_mont_mul_pallas_parity(rng):
    n = 1500  # non-tile-aligned on purpose
    a = jnp.asarray(ints_to_limbs(_mont_ints(rng, n)))
    b = jnp.asarray(ints_to_limbs(_mont_ints(rng, n)))
    got = mont_mul_pallas(a, b)
    want = mont.mont_mul(a, b)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fp_matmul_pallas_parity(rng):
    B, k, n = 13, 5, 7  # odd shapes, forces padding
    a = jnp.asarray(ints_to_limbs(
        np.asarray([_mont_ints(rng, k) for _ in range(B)], dtype=object)))
    v = jnp.asarray(ints_to_limbs(
        np.asarray([_mont_ints(rng, n) for _ in range(k)], dtype=object)))
    got = np.asarray(fp_matmul_pallas(a, v))
    # oracle with python ints
    ai = limbs_to_ints(np.asarray(a))
    vi = limbs_to_ints(np.asarray(v))
    rinv = pow(R_MOD_P, P - 2, P)
    want = np.zeros((B, n), dtype=object)
    for bb in range(B):
        for cc in range(n):
            acc = 0
            for j in range(k):
                acc += (int(ai[bb][j]) * rinv % P) * (int(vi[j][cc]) * rinv % P)
            want[bb, cc] = acc % P * R_MOD_P % P
    got_ints = limbs_to_ints(got)
    for bb in range(B):
        for cc in range(n):
            assert int(got_ints[bb][cc]) == want[bb, cc]
