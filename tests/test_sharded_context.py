"""The online MPC program layer (L4/L6) under shard_map — VERDICT r03 #1.

The same ShareArray program text (Beaver multiply, DoubleSharingMultiply,
equality, MiMC) runs three ways: SimBackend (single device, leading party
axis), MeshBackend (one party per device over the 8-virtual-device CPU
mesh), and HybridBackend (n parties over fewer devices). Fed identical
dealer preprocessing, all paths must agree BIT-EXACTLY — the reference
equivalence between TaskProgramRunner (mpc.py:280-306) and
ProcessProgramRunner (ipc.py:117-170) executions of one program.
"""

import numpy as np
import pytest

import jax

from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.parallel.mesh import device_mesh, party_mesh
from honeybadgermpc_tpu.runtime.context import (MixinConstants, MpcContext,
                                                double_sharing_multiply_arrays)
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements
from honeybadgermpc_tpu.runtime.sharded import (LocalPreproc,
                                                make_sharded_mpc_program,
                                                snapshot_preproc)

N, T = 8, 2
B = 6


def _deal(kinds: dict, seed=3):
    pre = PreProcessedElements(N, T, seed=seed)
    for kind, cnt in kinds.items():
        getattr(pre, f"generate_{kind}")(cnt)
    return snapshot_preproc(pre, kinds)


def _deal_inputs(values, seed=17):
    pre = PreProcessedElements(N, T, seed=seed)
    return pre._share_values(FpArray.from_ints(values))   # [n, B]


def _sim_run(prog, pre_arrays, inputs, mixins=None):
    ctx = MpcContext(N, T, preproc=LocalPreproc(dict(pre_arrays), lead=1),
                     mixins=mixins, robust=False)
    ins = tuple(ctx.ShareArray(x) for x in inputs)
    out = prog(ctx, *ins)
    outs = out if isinstance(out, tuple) else (out,)
    return tuple(o.v if hasattr(o, "v") else o for o in outs)


def _ints(fp, party=0):
    return [int(v) for v in np.asarray(fp.to_ints(), dtype=object)[party]]


def beaver_prog(ctx, x, y):
    z = x * y
    return z, ctx.open_share_array(z)


def test_beaver_mesh_vs_sim_bit_exact(rng):
    xs = [rng.randrange(P) for _ in range(B)]
    ys = [rng.randrange(P) for _ in range(B)]
    pre = _deal({"triples": B})
    x_g, y_g = _deal_inputs(xs), _deal_inputs(ys)

    z_sim, open_sim = _sim_run(beaver_prog, pre, (x_g, y_g))

    run = make_sharded_mpc_program(party_mesh(N), N, T, beaver_prog,
                                   mode="mesh", robust=False)
    z_sh, open_sh = run(pre, x_g, y_g)

    assert _ints(open_sh) == [x * y % P for x, y in zip(xs, ys)]
    np.testing.assert_array_equal(np.asarray(jax.device_get(z_sh.limbs)),
                                  np.asarray(jax.device_get(z_sim.limbs)))
    np.testing.assert_array_equal(np.asarray(jax.device_get(open_sh.limbs)),
                                  np.asarray(jax.device_get(open_sim.limbs)))


def test_beaver_hybrid_vs_sim_bit_exact(rng):
    xs = [rng.randrange(P) for _ in range(B)]
    ys = [rng.randrange(P) for _ in range(B)]
    pre = _deal({"triples": B})
    x_g, y_g = _deal_inputs(xs), _deal_inputs(ys)

    z_sim, open_sim = _sim_run(beaver_prog, pre, (x_g, y_g))

    # 8 parties over 4 devices: 2 simulated per device
    run = make_sharded_mpc_program(device_mesh(4), N, T, beaver_prog,
                                   mode="hybrid", robust=False)
    z_sh, open_sh = run(pre, x_g, y_g)

    assert _ints(open_sh) == [x * y % P for x, y in zip(xs, ys)]
    np.testing.assert_array_equal(np.asarray(jax.device_get(z_sh.limbs)),
                                  np.asarray(jax.device_get(z_sim.limbs)))
    np.testing.assert_array_equal(np.asarray(jax.device_get(open_sh.limbs)),
                                  np.asarray(jax.device_get(open_sim.limbs)))


def test_double_sharing_multiply_parity(rng):
    """DoubleSharingMultiplyArrays (share_arithmetic.py:71) opens the same
    products as Beaver on the same inputs — and runs under the mesh."""
    xs = [rng.randrange(P) for _ in range(B)]
    ys = [rng.randrange(P) for _ in range(B)]
    expected = [x * y % P for x, y in zip(xs, ys)]
    x_g, y_g = _deal_inputs(xs), _deal_inputs(ys)
    mix = {MixinConstants.MultiplyShareArray: double_sharing_multiply_arrays}

    pre_ds = _deal({"double_shares": B})
    _, open_ds = _sim_run(beaver_prog, pre_ds, (x_g, y_g), mixins=mix)
    assert _ints(open_ds) == expected

    pre_bv = _deal({"triples": B})
    _, open_bv = _sim_run(beaver_prog, pre_bv, (x_g, y_g))
    assert _ints(open_bv) == expected

    run = make_sharded_mpc_program(party_mesh(N), N, T, beaver_prog,
                                   mode="mesh", robust=False, mixins=mix)
    _, open_sh = run(_deal({"double_shares": B}), x_g, y_g)
    assert _ints(open_sh) == expected
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(open_sh.limbs)),
        np.asarray(jax.device_get(open_ds.limbs)))


@pytest.mark.slow
def test_equality_sharded(rng):
    """Secure equality (Legendre mixin) as a sharded program: the opened
    test product is nonzero iff equal, and matches the sim path bit-exactly."""
    from honeybadgermpc_tpu.runtime.comparison import equality

    s = 8
    Bq = 4
    xs = [rng.randrange(P) for _ in range(Bq)]
    ys = list(xs)
    ys[1] = (ys[1] + 1) % P                     # one unequal pair
    kinds = {"triples": 4 * Bq * s, "bits": Bq * s, "rands": 2 * Bq * s}

    def prog(ctx, x, y):
        eq = equality(ctx, x, y, security_parameter=s)
        return ctx.open_share_array(eq)

    x_g, y_g = _deal_inputs(xs), _deal_inputs(ys)
    (open_sim,) = _sim_run(prog, _deal(kinds), (x_g, y_g))

    run = make_sharded_mpc_program(party_mesh(N), N, T, prog, mode="mesh",
                                   robust=False)
    (open_sh,) = run(_deal(kinds), x_g, y_g)

    vals = _ints(open_sh)
    assert vals[0] != 0 and vals[2] != 0 and vals[3] != 0
    assert vals[1] == 0
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(open_sh.limbs)),
        np.asarray(jax.device_get(open_sim.limbs)))


@pytest.mark.slow
def test_mimc_sharded_vs_sim_bit_exact(rng, monkeypatch):
    """mimc_mpc_batch at n=8 over the 8-virtual-device mesh, bit-exact vs
    the sim path AND the plaintext oracle. ROUND is reduced (the program
    text and per-round protocol are identical for any round count; the
    161-round constant only scales compile time, covered on the sim path
    by tests/test_runtime_mimc.py)."""
    import honeybadgermpc_tpu.models.mimc as mimc_mod

    rounds = 6
    monkeypatch.setattr(mimc_mod, "ROUND", rounds)
    key = 0xDEADBEEF
    xs = [rng.randrange(P) for _ in range(4)]
    kinds = {"cubes": rounds * 4}

    def prog(ctx, x):
        out = mimc_mod.mimc_mpc_batch(ctx, x, key)
        return ctx.open_share_array(out)

    x_g = _deal_inputs(xs)
    (open_sim,) = _sim_run(prog, _deal(kinds), (x_g,))

    run = make_sharded_mpc_program(party_mesh(N), N, T, prog, mode="mesh",
                                   robust=False)
    (open_sh,) = run(_deal(kinds), x_g)

    assert _ints(open_sh) == [mimc_mod.mimc_plain(x, key) for x in xs]
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(open_sh.limbs)),
        np.asarray(jax.device_get(open_sim.limbs)))


def test_double_sharing_degree_guard(rng):
    """open_double_share_array refuses non-2t shares; the mixin consumes
    exactly k double shares per k-element multiply."""
    pre_arrays = _deal({"double_shares": B})
    lp = LocalPreproc(dict(pre_arrays), lead=1)
    ctx = MpcContext(
        N, T, preproc=lp, robust=False,
        mixins={MixinConstants.MultiplyShareArray:
                double_sharing_multiply_arrays})
    xs = [rng.randrange(P) for _ in range(B)]
    sx = ctx.ShareArray(_deal_inputs(xs))
    with pytest.raises(AssertionError):
        ctx.open_double_share_array(sx)          # degree t, not 2t
    _ = sx * sx                                  # consumes all B doubles
    assert lp.cursors["double_shares"] == B


@pytest.mark.slow
def test_less_than_sharded(rng):
    """SLOW tier: the ~10-open 255-bit-axis program under shard_map is the
    suite's biggest single XLA:CPU compile, and this jaxlib sporadically
    segfaults compiling it inside a loaded xdist worker (passes
    standalone; the Byzantine sharded tests keep mesh-program coverage in
    the fast tier).
    Reistad LessThan as a sharded program (mesh, 8 devices): bitwise
    share_bits preprocessing sliced per party, ~10 batched Beaver opens,
    bit-exact vs the sim path."""
    from honeybadgermpc_tpu.runtime.comparison import less_than

    pairs = [(3, 9), (9, 3)]
    # less_than draws share_bits twice per element (r and s stages)
    kinds = {"share_bits": 2 * len(pairs), "triples": 1600}

    def prog(ctx, x, y):
        return ctx.open_share_array(less_than(ctx, x, y))

    x_g = _deal_inputs([a for a, _ in pairs])
    y_g = _deal_inputs([b for _, b in pairs])
    (open_sim,) = _sim_run(prog, _deal(kinds), (x_g, y_g))

    run = make_sharded_mpc_program(party_mesh(N), N, T, prog, mode="mesh",
                                   robust=False)
    (open_sh,) = run(_deal(kinds), x_g, y_g)

    assert _ints(open_sh) == [1, 0]
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(open_sh.limbs)),
        np.asarray(jax.device_get(open_sim.limbs)))


def test_beaver_byzantine_party_mesh_robust(rng):
    """VERDICT r04 #1: a Byzantine party corrupting every value it sends —
    INSIDE the opens of a full Beaver program under shard_map, robust=True
    (reference: induce_faults through program runs, mpc.py:126-131 +
    batch_reconstruction.py:129-131). The decoder must correct it: outputs
    bit-exact vs the fault-free sim run, and every party's corrected-error
    tally is positive."""
    xs = [rng.randrange(P) for _ in range(B)]
    ys = [rng.randrange(P) for _ in range(B)]
    pre = _deal({"triples": B})
    x_g, y_g = _deal_inputs(xs), _deal_inputs(ys)

    z_sim, open_sim = _sim_run(beaver_prog, pre, (x_g, y_g))

    run = make_sharded_mpc_program(party_mesh(N), N, T, beaver_prog,
                                   mode="mesh", robust=True,
                                   fault_parties=(3,), return_nerr=True)
    z_sh, open_sh, nerr = run(pre, x_g, y_g)

    assert _ints(open_sh) == [x * y % P for x, y in zip(xs, ys)]
    np.testing.assert_array_equal(np.asarray(jax.device_get(z_sh.limbs)),
                                  np.asarray(jax.device_get(z_sim.limbs)))
    np.testing.assert_array_equal(np.asarray(jax.device_get(open_sh.limbs)),
                                  np.asarray(jax.device_get(open_sim.limbs)))
    counts = np.asarray(jax.device_get(nerr)).tolist()
    assert all(c > 0 for c in counts), counts


def test_beaver_two_byzantine_parties_hybrid_robust(rng):
    """t=2 Byzantine parties (the full corruption budget) across DEVICE
    boundaries: 8 parties over 4 devices, faulty parties 1 and 6 live on
    different devices; a Beaver multiply + open still corrects to the
    fault-free sim's exact limbs."""
    xs = [rng.randrange(P) for _ in range(B)]
    ys = [rng.randrange(P) for _ in range(B)]
    pre = _deal({"triples": B})
    x_g, y_g = _deal_inputs(xs), _deal_inputs(ys)

    z_sim, open_sim = _sim_run(beaver_prog, pre, (x_g, y_g))

    run = make_sharded_mpc_program(device_mesh(4), N, T, beaver_prog,
                                   mode="hybrid", robust=True,
                                   fault_parties=(1, 6), return_nerr=True)
    z_sh, open_sh, nerr = run(pre, x_g, y_g)

    assert _ints(open_sh) == [x * y % P for x, y in zip(xs, ys)]
    np.testing.assert_array_equal(np.asarray(jax.device_get(z_sh.limbs)),
                                  np.asarray(jax.device_get(z_sim.limbs)))
    np.testing.assert_array_equal(np.asarray(jax.device_get(open_sh.limbs)),
                                  np.asarray(jax.device_get(open_sim.limbs)))
    counts = np.asarray(jax.device_get(nerr)).tolist()
    assert all(c > 0 for c in counts), counts


def test_mimc_byzantine_party_mesh_robust(rng, monkeypatch):
    """A multi-round program (MiMC) with a Byzantine party: every round's
    cube open is corrupted by party 5 and corrected; the ciphertext still
    equals the plaintext oracle and the fault-free sim bit-exactly."""
    import honeybadgermpc_tpu.models.mimc as mimc_mod

    rounds = 4
    monkeypatch.setattr(mimc_mod, "ROUND", rounds)
    key = 0xC0FFEE
    xs = [rng.randrange(P) for _ in range(4)]
    kinds = {"cubes": rounds * 4}

    def prog(ctx, x):
        out = mimc_mod.mimc_mpc_batch(ctx, x, key)
        return ctx.open_share_array(out)

    x_g = _deal_inputs(xs)
    (open_sim,) = _sim_run(prog, _deal(kinds), (x_g,))

    run = make_sharded_mpc_program(party_mesh(N), N, T, prog, mode="mesh",
                                   robust=True, fault_parties=(5,),
                                   return_nerr=True)
    open_sh, nerr = run(_deal(kinds), x_g)

    assert _ints(open_sh) == [mimc_mod.mimc_plain(x, key) for x in xs]
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(open_sh.limbs)),
        np.asarray(jax.device_get(open_sim.limbs)))
    counts = np.asarray(jax.device_get(nerr)).tolist()
    assert all(c > 0 for c in counts), counts


def test_open_share_arrays_aggregation(rng):
    """ctx.open_share_arrays: several independent opens collapse into one
    reconstruction (the many-small-opens latency API, VERDICT r04 #6) —
    values match per-array opens, shapes restored, one opened_count bump."""
    xs = [rng.randrange(P) for _ in range(4)]
    ys = [rng.randrange(P) for _ in range(6)]
    pre_arrays = _deal({"triples": 1})
    ctx = MpcContext(N, T, preproc=LocalPreproc(dict(pre_arrays), lead=1),
                     robust=False)
    sx = ctx.ShareArray(_deal_inputs(xs))
    sy = ctx.ShareArray(_deal_inputs(ys, seed=23))
    a, b = ctx.open_share_arrays([sx, sy])
    assert [int(v) for v in np.asarray(a.to_ints(), object)[0]] == xs
    assert [int(v) for v in np.asarray(b.to_ints(), object)[0]] == ys
    assert a.shape[-1] == 4 and b.shape[-1] == 6
