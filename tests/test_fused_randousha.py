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
                                                        _randousha_calls)
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
    _, z_t = ke(cols_t, run.folded_band(key))
    kk = T + 1
    pad = (-K) % kk
    zp = jnp.concatenate(
        [z_t, jnp.zeros((8, N, pad), jnp.uint32)], axis=-1) if pad else z_t
    opener = _sim_reconstruct_packed_jit(N, T, False, True,
                                         fallback=False, replicate=False)
    _, nerr = opener(zp)
    assert int(np.asarray(jax.device_get(nerr)).sum()) > 0


def test_ransha_single_degree():
    """sim_ransha_fused: verified degree-t sharings only (the a/b slots of
    triple generation) — party agreement, uniqueness, degree check."""
    from honeybadgermpc_tpu.ops.fused_randousha import sim_ransha_fused
    kd = jnp.asarray([9, 1], jnp.uint32)
    r_t, ok = sim_ransha_fused(kd, N, T, K)
    assert bool(ok)
    m = K * (N - 2 * T)
    assert r_t.shape == (8, N, m)
    v, e = _open(r_t, N, T)
    assert e == 0
    a = v[0]
    assert all(list(v[i]) == list(a) for i in range(N))
    assert len(set(map(int, a))) == m

    # disjoint keys give disjoint outputs
    r_t2, ok2 = sim_ransha_fused(jnp.asarray([9, 2], jnp.uint32), N, T, K)
    assert bool(ok2)
    v2, _ = _open(r_t2, N, T)
    assert set(map(int, v2[0])).isdisjoint(set(map(int, a)))


def test_fused_triples_ransha_pipeline():
    """fused_generate_triples over the RanSha a/b + RanDouSha r split:
    opened triples satisfy ab = a*b (mirrors reference
    tests/test_offline_randousha.py::test_triples)."""
    import jax as _jax

    from honeybadgermpc_tpu.parallel.mesh import SimBackend
    from honeybadgermpc_tpu.runtime.offline import fused_generate_triples
    k = 16
    a, b, ab, ok = fused_generate_triples(
        SimBackend(N), N, T, k, _jax.random.PRNGKey(3))
    assert bool(_jax.device_get(ok))
    A, ea = _open_fp(a, N, T)
    B_, eb = _open_fp(b, N, T)
    AB, eab = _open_fp(ab, N, T)
    assert ea == 0 and eb == 0 and eab == 0
    for x, y, xy in zip(A[0], B_[0], AB[0]):
        assert int(xy) == int(x) * int(y) % P


def _open_fp(fp, n, deg):
    kk = deg + 1
    B = fp.shape[-1]
    pad = (-B) % kk
    sh = fp if not pad else FpArray.concatenate(
        [fp, FpArray.zeros((n, pad))], axis=1)
    vals, nerr = sim_batch_reconstruct(sh, n, deg)
    return (FpArray(vals.limbs[..., :B]).to_ints(),
            int(np.asarray(jax.device_get(nerr)).sum()))


def test_aggregate_check_boundary_known_rho_bypass():
    """ADVERSARIAL BOUNDARY (VERDICT r03): the rho-aggregated cross-degree
    check is sound only while rho is unpredictable at dealing time. Two
    colluding dealers who KNOW rho can deal degree-valid t/2t polynomials
    whose secrets differ by delta_1, delta_2 with
        delta_1 * S(d1) + delta_2 * S(d2) = 0,   S(d) = sum_c rho_c x_c^d
    so the aggregated equality passes while the per-column check catches
    it. This test demonstrates the bypass — hence the SimBackend hard gate
    on the fused pipeline (runtime/offline.py::fused_randousha): in the
    sim, rho and all dealings come from one trusted run key; distributed
    paths keep per-column opens."""
    from honeybadgermpc_tpu.ops.fused_randousha import (_CTR_TAG, NBAL, TBW,
                                                        _randousha_calls)
    from honeybadgermpc_tpu.ops.limbs import L, MASK, W
    from honeybadgermpc_tpu.ops.pallas_field import (_redc384_reg,
                                                     _threefry2x32)
    from honeybadgermpc_tpu.ops.rs import Encoding
    from honeybadgermpc_tpu.parallel.reconstruct import \
        _sim_reconstruct_packed_jit

    enc = Encoding(N)
    points = [int(x) % P for x in enc.points]
    n_out, ncheck = N - 2 * T, 2 * T
    run = _randousha_calls(N, T, K, tuple(points), aggregate=True)
    kd_t, kd_2, ke, _, _, e1w, e2w, enw, r1w, r2w = run.parts
    runpc = _randousha_calls(N, T, K, tuple(points), aggregate=False)
    _, _, ke_pc, kc_t, kc_2, *_ = runpc.parts

    key = jnp.asarray([5, 6], jnp.uint32)

    # --- the adversary derives rho exactly as _rho_plain does ------------
    shape = (1, 64)
    c1 = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    rows24 = []
    for s in range(6):
        w0, w1 = _threefry2x32(key[0], key[1],
                               jnp.full(shape, jnp.uint32(0x20000 + s)), c1)
        for wrd in (w0, w1):
            rows24.append(wrd & MASK)
            rows24.append(wrd >> W)
    limbs = _redc384_reg(rows24, shape)              # L x (1, 64)
    limbs = np.asarray(jax.device_get(jnp.stack(limbs)))
    rho = [sum(int(limbs[j, 0, c]) << (W * j) for j in range(L))
           for c in range(ncheck)]

    d1, d2 = 2, 5                                    # colluding dealers
    S = [sum(r * pow(points[n_out + c], d, P) for c, r in enumerate(rho)) % P
         for d in (d1, d2)]
    assert S[0] % P and S[1] % P
    delta1 = 12345
    delta2 = (-delta1 * S[0] * pow(S[1], P - 2, P)) % P

    # --- honest dealings, then shift the two dealers' 2t SECRETS ---------
    cols_t = kd_t(key.reshape(1, 2), e1w)
    cols_2t = kd_2(key.reshape(1, 2), e2w)

    def shift_dealer(cols, dealer, delta):
        # cols [nblk, njt, PL, n_src, JT, TBW] packed Montgomery; adding a
        # constant to every dealt value = dealing secret + delta with the
        # same (valid) degree-2t high part
        lim = jnp.moveaxis(cols, 2, 0)               # [PL, ...]
        vals = FpArray(unpack_limbs(lim))
        dv = FpArray.from_int(delta)
        upd = vals.take([dealer], axis=2) + dv
        vals = FpArray(vals.limbs.at[:, :, :, dealer].set(
            upd.limbs[:, :, :, 0]))
        from honeybadgermpc_tpu.ops.fused_open import pack_limbs
        return jnp.moveaxis(pack_limbs(vals.limbs), 0, 2)

    cols_2t = shift_dealer(cols_2t, d1, delta1)
    cols_2t = shift_dealer(cols_2t, d2, delta2)

    # --- aggregated path: UNDETECTED ---------------------------------------
    band = run.folded_band(key)
    _, z_t = ke(cols_t, band)
    _, z_2t = ke(cols_2t, band)

    def open_z(z, deg):
        kk = deg + 1
        pad = (-K) % kk
        zp = jnp.concatenate(
            [z, jnp.zeros((8, N, pad), jnp.uint32)], axis=-1) if pad else z
        op = _sim_reconstruct_packed_jit(N, deg, False, True,
                                         fallback=False, replicate=False)
        sec, nerr = op(zp)
        if sec.ndim == 3:
            sec = sec[:, 0]
        return sec, int(np.asarray(jax.device_get(nerr)).sum())

    vt, et = open_z(z_t, T)
    v2, e2 = open_z(z_2t, 2 * T)
    neq = int(np.asarray(jax.device_get(jnp.sum(jnp.any(
        vt[:, :K] != v2[:, :K], axis=0).astype(jnp.int32)))))
    assert et == 0 and e2 == 0 and neq == 0, \
        "bypass failed: aggregate check caught the crafted dealing"

    # --- per-column path: CAUGHT -------------------------------------------
    _, chk_t = ke_pc(cols_t, enw)
    _, chk_2t = ke_pc(cols_2t, enw)
    vt_c, et_c = kc_t(chk_t, r1w)
    v2_c, e2_c = kc_2(chk_2t, r2w)
    neq_c = int(np.asarray(jax.device_get(jnp.sum(jnp.any(
        vt_c[:, :ncheck] != v2_c[:, :ncheck], axis=0).astype(jnp.int32)))))
    assert neq_c > 0, "per-column check must catch the inconsistent secrets"
