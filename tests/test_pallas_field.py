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


@pytest.mark.slow
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


def _rand_mont_mat(rng, rows, cols):
    return jnp.asarray(ints_to_limbs(np.asarray(
        [_mont_ints(rng, cols) for _ in range(rows)], dtype=object)))


def _matmul_oracle(a, v):
    ai = limbs_to_ints(np.asarray(a))
    vi = limbs_to_ints(np.asarray(v))
    B, k = ai.shape
    n = vi.shape[1]
    rinv = pow(R_MOD_P, P - 2, P)
    want = np.zeros((B, n), dtype=object)
    for bb in range(B):
        for cc in range(n):
            acc = 0
            for j in range(k):
                acc += (int(ai[bb][j]) * rinv % P) * \
                       (int(vi[j][cc]) * rinv % P)
            want[bb, cc] = acc % P * R_MOD_P % P
    return want


@pytest.mark.parametrize("B,k,n", [
    (256, 5, 7),     # rounds=1, odd n
    (256, 22, 64),   # rounds=1 boundary region (bench shape, tiny B)
    (130, 31, 8),    # rounds=2, unaligned B
])
def test_fp_matmul_mxu2_parity(rng, B, k, n):
    from honeybadgermpc_tpu.ops.mxu_matmul import fp_matmul_mxu2
    a = _rand_mont_mat(rng, B, k)
    v = _rand_mont_mat(rng, k, n)
    got = limbs_to_ints(np.asarray(fp_matmul_mxu2(a, v)))
    want = _matmul_oracle(a, v)
    for bb in range(B):
        for cc in range(n):
            assert int(got[bb][cc]) == want[bb, cc], (bb, cc)


def test_fp_matmul_mxu_v1_parity(rng):
    from honeybadgermpc_tpu.ops.mxu_matmul import fp_matmul_mxu
    B, k, n = 256, 9, 12
    a = _rand_mont_mat(rng, B, k)
    v = _rand_mont_mat(rng, k, n)
    got = limbs_to_ints(np.asarray(fp_matmul_mxu(a, v)))
    want = _matmul_oracle(a, v)
    for bb in range(B):
        for cc in range(n):
            assert int(got[bb][cc]) == want[bb, cc], (bb, cc)


def test_redc384_exact(rng):
    """redc384(T) == T * 2^-144 mod p for random/edge 384-bit T (the
    uniform-sampling reduction, ops/montgomery.py)."""
    import jax

    Ts = [rng.randrange(0, 2 ** 384) for _ in range(32)] + \
        [0, 1, P - 1, P, 2 ** 256, 2 ** 384 - 1]
    arr = np.zeros((mont.RAND_LIMBS, len(Ts)), np.uint32)
    for i, T in enumerate(Ts):
        for j in range(mont.RAND_LIMBS):
            arr[j, i] = (T >> (16 * j)) & 0xFFFF
    out = np.asarray(jax.device_get(mont.redc384(jnp.asarray(arr))))
    inv = pow(pow(2, 144, P), P - 2, P)
    for i, T in enumerate(Ts):
        got = sum(int(out[j, i]) << (16 * j) for j in range(16))
        assert got == T * inv % P


def test_threefry_kernel_parity():
    """In-kernel Threefry-2x32 matches jax's reference implementation."""
    import jax
    from jax._src.prng import threefry_2x32

    from honeybadgermpc_tpu.ops.pallas_field import _threefry2x32
    k = jnp.array([0x1234ABCD, 0x9E3779B9], jnp.uint32)
    c0 = jnp.arange(64, dtype=jnp.uint32)
    c1 = c0 + jnp.uint32(7)
    ref = np.asarray(threefry_2x32(k, jnp.concatenate([c0, c1])))
    x0, x1 = _threefry2x32(k[0], k[1], c0, c1)
    assert np.array_equal(np.concatenate([np.asarray(x0), np.asarray(x1)]),
                          ref)


def test_rand_limbs_pallas():
    """Fused sampling kernel: canonical (< p), deterministic per key,
    key-sensitive, all-distinct, centered."""
    import jax

    from honeybadgermpc_tpu.ops.pallas_field import rand_limbs_pallas
    kd = jnp.asarray([1, 2], jnp.uint32)
    out = np.asarray(jax.device_get(rand_limbs_pallas(kd, 5000)))
    vals = [sum(int(out[j, i]) << (16 * j) for j in range(16))
            for i in range(5000)]
    assert all(v < P for v in vals)
    assert len(set(vals)) == 5000
    assert 0.45 < sum(vals) / 5000 / P < 0.55
    out2 = np.asarray(jax.device_get(rand_limbs_pallas(kd, 5000)))
    assert np.array_equal(out, out2)
    out3 = np.asarray(jax.device_get(
        rand_limbs_pallas(jnp.asarray([1, 3], jnp.uint32), 5000)))
    assert not np.array_equal(out, out3)


@pytest.mark.slow
def test_mul_add_packed_parity(rng):
    """Packed-domain (a*b + c) mod p vs Python ints."""
    import jax

    from honeybadgermpc_tpu.ops.fused_open import pack_limbs, unpack_limbs
    from honeybadgermpc_tpu.ops.limbs import R_MOD_P
    from honeybadgermpc_tpu.ops.pallas_field import mul_add_packed
    B = 300
    av = [rng.randrange(P) for _ in range(B)]
    bv = [rng.randrange(P) for _ in range(B)]
    cv = [rng.randrange(P) for _ in range(B)]
    pk = [pack_limbs(jnp.asarray(ints_to_limbs(np.array(v, object))))
          for v in (av, bv, cv)]
    out = mul_add_packed(*pk)
    got = limbs_to_ints(np.asarray(jax.device_get(unpack_limbs(out))))
    rinv = pow(R_MOD_P, P - 2, P)
    for i in range(B):
        want = (av[i] * bv[i] * rinv + cv[i]) % P
        assert int(got[i]) == want, i
