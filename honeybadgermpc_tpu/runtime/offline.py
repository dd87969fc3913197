"""Offline preprocessing protocols: RanDouSha, triples, bits.

TPU redesign of the reference's offline_randousha.py (randousha :34-151,
generate_triples :154-191, generate_bits :194-232 — HyperMPC-style linear-
overhead preprocessing). The asyncio tag-multiplexed exchanges (H1/H2/H3)
become three collective steps:

  H1  deal:    every party Shamir-shares k secrets at degrees t and 2t
               (one batched encode each) and ALL_TO_ALLs the share columns.
  ext extract: the n received shares per slot are treated as POLYNOMIAL
               COEFFICIENTS and re-encoded at the n party points — the
               hyperinvertible-matrix multiply (offline_randousha.py:74-78)
               is exactly a Vandermonde matmul.
  H2/H3 check: the last n-(n-2t) output columns are opened (they are
               discarded anyway) and verified: degree-t/2t consistency and
               equality of both secrets; any error aborts (unanimity vote).

Outputs: n-2t double sharings per input slot, secrecy t against the
Byzantine threshold — same parameters as the reference (big_t = n-2t-1).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fparray import FpArray
from ..ops.limbs import P
from ..ops.rs import Encoding
from ..parallel.mesh import SimBackend
from ..parallel.reconstruct import batch_reconstruct
from .context import MpcContext, ShareArray


def _deal_own(enc: Encoding, secrets: FpArray, degree: int, key) -> FpArray:
    """Share own secrets[..., k] at the given degree -> [..., k, n] columns
    (column j goes to party j)."""
    k = secrets.shape[-1]
    hi = FpArray.rand(key, secrets.shape + (degree,))
    coeffs = FpArray.concatenate(
        [FpArray(secrets.limbs[..., None]), hi], axis=secrets.ndim)
    return enc.encode(coeffs)


def _open_columns(backend, cols: FpArray, n: int, degree: int,
                  in_graph_fallback: bool = True):
    """Open sharings held column-wise: cols[party, ..., C] -> (values, nerr).
    Flattens trailing dims and pads to the chunk size.

    ``in_graph_fallback=False`` (only meaningful under an enclosing jit):
    detect-only opens — validation error counts still come back in nerr,
    but the in-graph Gao robust branch is NOT compiled into the program.
    Correct for the offline protocols because their response to ANY decode
    error is already to abort the batch (ok=False, reference
    offline_randousha.py:133-146) — the opened values only need to be
    trustworthy when nerr == 0. This also selects the single-kernel
    direct-composition open (ops/fused_open_direct.py), ~3-4x the
    three-kernel pipeline's throughput."""
    shape = cols.shape  # sim: (n, k, C)
    flat = cols.reshape(shape[:1] + (int(np.prod(shape[1:])),)) \
        if isinstance(backend, SimBackend) else cols.reshape((int(np.prod(shape)),))
    k = degree + 1
    B = flat.shape[-1]
    pad = (-B) % k
    if pad:
        flat = FpArray.concatenate(
            [flat, FpArray.zeros(flat.shape[:-1] + (pad,))], axis=flat.ndim - 1)

    import os

    import jax

    from ..ops.fused_open import KMAX, sim_open_fused, unpack_limbs
    from ..ops.fused_open_direct import direct_fits
    on_tpu = (isinstance(backend, SimBackend)
              and jax.default_backend() not in ("cpu",)
              and not os.environ.get("HBMPC_NO_FUSED_OPEN"))
    if on_tpu:
        import jax.core

        from ..ops import montgomery as mont
        enc = Encoding(n)
        points = tuple(int(x) % mont.P for x in enc.points)
        # host-level calls run two-phase (detect in-graph, robust redo on
        # the host) — see parallel/reconstruct.py::sim_batch_reconstruct
        traced = isinstance(flat.limbs, jax.core.Tracer)
        robust = traced and in_graph_fallback
    use_fused = on_tpu and ((not robust and direct_fits(n, k))
                            or (n % 8 == 0 and k <= KMAX))
    if use_fused:
        if not robust and direct_fits(n, k):
            from ..ops.fused_open import pack_limbs
            from ..ops.fused_open_direct import sim_open_direct_packed
            packed, nerr = sim_open_direct_packed(
                pack_limbs(flat.limbs), n, degree, points)
        else:
            packed, nerr = sim_open_fused(flat.limbs, n, degree, points,
                                          robust=robust)
        vals = FpArray(unpack_limbs(packed))
        if not traced and int(jax.device_get(jnp.sum(nerr))) != 0:
            from ..parallel.reconstruct import host_robust_redo
            limbs_np, nerr = host_robust_redo(
                np.asarray(jax.device_get(flat.limbs)), n, degree)
            vals = FpArray(jax.device_put(limbs_np))
    else:
        vals, nerr = batch_reconstruct(backend, flat, n, degree, robust=True,
                                       fallback=in_graph_fallback)
    vals = FpArray(vals.limbs[..., :B])
    out_shape = shape[:1] + shape[1:] if isinstance(backend, SimBackend) else shape
    return vals.reshape(out_shape), nerr


def randousha(backend, n: int, t: int, k: int, key,
              in_graph_fallback: bool = True):
    """Generate k*(n-2t) double sharings (r_t, r_2t) with verification.

    backend: SimBackend (shares carry leading party axis) or MeshBackend.
    Returns (r_t [party.., k*(n-2t)], r_2t, ok) — ok False means some party
    dealt inconsistently and the batch must be discarded (ABORT vote,
    offline_randousha.py:133-146).

    Deliberately NOT jitted at this level: (a) jit would key the compiled
    program on the backend OBJECT's identity, so every fresh SimBackend
    silently retraces a multi-second program; (b) eager entry keeps
    _open_columns' inputs concrete, which routes robust fallback through
    the host two-phase redo instead of compiling the in-graph Gao EEA into
    one giant program (the pattern that sporadically crashes this
    platform's TPU worker). The inner kernels are all shape-cached jits;
    callers who need ONE compiled program (shard_map, benchmarks) use
    ``sim_offline_jit`` below or wrap in jit themselves."""
    enc = Encoding(n)
    sim = isinstance(backend, SimBackend)
    lead = (n,) if sim else ()
    key, k1, k2, k3 = jax.random.split(key, 4)
    secrets = FpArray.rand(k1, lead + (k,))

    sh_t = _deal_own(enc, secrets, t, k2)          # [.., k, n]
    sh_2t = _deal_own(enc, secrets, 2 * t, k3)
    recv_t = backend.all_to_all(sh_t)              # [.., k, n] dealer-indexed
    recv_2t = backend.all_to_all(sh_2t)

    # hyperinvertible extraction: received vector (over dealers) = coeffs
    out_t = enc.encode(recv_t)                     # [.., k, n] output-indexed
    out_2t = enc.encode(recv_2t)

    n_out = n - 2 * t                              # big_t + 1 outputs kept
    keep_t = FpArray(out_t.limbs[..., :n_out])
    keep_2t = FpArray(out_2t.limbs[..., :n_out])
    check_t = FpArray(out_t.limbs[..., n_out:])
    check_2t = FpArray(out_2t.limbs[..., n_out:])

    # verification: open discarded columns at both degrees; abort on any
    # decode error or secret mismatch
    v_t, e_t = _open_columns(backend, check_t, n, t, in_graph_fallback)
    v_2t, e_2t = _open_columns(backend, check_2t, n, 2 * t,
                               in_graph_fallback)
    equal = v_t.eq(v_2t)
    ok = jnp.all(equal) & (jnp.sum(e_t) == 0) & (jnp.sum(e_2t) == 0)

    flat = lead + (k * n_out,)
    return keep_t.reshape(flat), keep_2t.reshape(flat), ok


def generate_triples(backend, n: int, t: int, k: int, key,
                     in_graph_fallback: bool = True):
    """Beaver triples from RanDouSha (offline_randousha.py:154-191): draw
    3k double sharings; use (a, b, r): open a*b + r at degree 2t, subtract
    r_t. Returns (a, b, ab) share tensors [party.., k] and ok flag."""
    r_t, r_2t, ok = randousha(backend, n, t, 3 * k, key, in_graph_fallback)
    m = r_t.shape[-1]
    cnt = m // 3
    a = FpArray(r_t.limbs[..., :cnt])
    b = FpArray(r_t.limbs[..., cnt:2 * cnt])
    rt = FpArray(r_t.limbs[..., 2 * cnt:3 * cnt])
    r2t = FpArray(r_2t.limbs[..., 2 * cnt:3 * cnt])

    ab_plus_r = a * b + r2t                         # local degree-2t share
    opened, nerr = _open_columns(backend, ab_plus_r, n, 2 * t,
                                 in_graph_fallback)
    ab = opened - rt                                # degree-t share of ab
    ok = ok & (jnp.sum(nerr) == 0)
    return a, b, ab, ok


def generate_bits(backend, n: int, t: int, k: int, key,
                  in_graph_fallback: bool = True):
    """Random shared bits via the u/sqrt(u^2) trick
    (offline_randousha.py:194-232). Returns (bits [party.., m], ok)."""
    r_t, r_2t, ok = randousha(backend, n, t, 2 * k, key, in_graph_fallback)
    m = r_t.shape[-1]
    cnt = m // 2
    u = FpArray(r_t.limbs[..., :cnt])
    rt = FpArray(r_t.limbs[..., cnt:2 * cnt])
    r2t = FpArray(r_2t.limbs[..., cnt:2 * cnt])

    # open u^2 (masked at 2t then unmasked publicly: u2 = open(u*u + r_2t) - open(r)…
    # simpler: open u*u + r_2t, then subtract r_t and open again)
    u2_masked = u * u + r2t
    opened, e1 = _open_columns(backend, u2_masked, n, 2 * t,
                               in_graph_fallback)
    u2_share = opened - rt                          # degree-t share of u^2
    u2, e2 = _open_columns(backend, u2_share, n, t,
                           in_graph_fallback)       # public u^2

    root, has_root = u2.sqrt()                      # canonical root
    # bit = (u/root + 1) / 2  in {0, 1}; u == ±root
    inv2 = FpArray.from_int(pow(2, P - 2, P))
    sign = u * root.inv()                           # share of ±1
    bits = (sign + FpArray.from_int(1)) * inv2
    ok = ok & (jnp.sum(e1) == 0) & (jnp.sum(e2) == 0) & jnp.all(has_root)
    return bits, ok


def fused_randousha(backend, n: int, t: int, k: int, key):
    """Drop-in randousha on the fused kernel pipeline
    (ops/fused_randousha.py): ~3x the unfused collective program on TPU.
    Detect-only (any check failure -> ok False; rerun the eager
    `randousha` for fault localization).

    HARD-GATED to SimBackend: the pipeline's aggregated verification
    derives rho from the same run key that fixes the dealings — sound in
    the sim, where the whole program is one trusted process, but NOT in a
    distributed deployment where an adversarial dealer could learn rho
    before dealing and craft cross-degree inconsistencies that cancel in
    the aggregate (Schwartz-Zippel needs rho unpredictable at dealing
    time; the bypass is demonstrated in tests/test_fused_randousha.py::
    test_aggregate_check_boundary_known_rho_bypass). Distributed paths
    (sharded_offline_jit) use the eager `randousha` with per-column check
    opens."""
    assert isinstance(backend, SimBackend), \
        "fused (rho-aggregated) randousha is sim-only; see docstring"
    from ..ops.fused_open import unpack_limbs
    from ..ops.fused_randousha import sim_randousha_fused
    kd = _key_data(key)
    pt, p2, ok = sim_randousha_fused(kd, n, t, k)
    return (FpArray(unpack_limbs(pt)), FpArray(unpack_limbs(p2)), ok)


def fused_generate_triples(backend, n: int, t: int, k: int, key,
                           packed: bool = False):
    """Beaver triples over the fused pipelines, producing k*(n-2t) triples:
    a and b come from single-degree RanSha (their 2t halves would be dead
    weight — the reference's generate_triples only ever uses the degree-t
    part of the first 2k sharings, offline_randousha.py:176-186), r from
    RanDouSha, then the a*b + r_2t finish opened at degree 2t (the direct
    single-kernel open when it fits). Detect-only: decode errors flip ok.
    Distinct folded subkeys keep the three dealings' Threefry streams
    disjoint. Sim-only, like fused_randousha (rho-aggregated checks)."""
    assert isinstance(backend, SimBackend), \
        "fused (rho-aggregated) triple pipeline is sim-only"
    from ..ops import montgomery as mont
    from ..ops.fused_open import unpack_limbs
    from ..ops.fused_randousha import sim_randousha_fused, sim_ransha_fused
    from ..parallel.reconstruct import _sim_reconstruct_packed_jit

    ka, kb, kr = jax.random.split(key, 3)
    # packed mode keeps the extraction tensors in their PADDED column
    # layout ([PL, n, n_outp*k], real triples the contiguous prefix
    # [:n_out*k]): the per-tensor column-drop slices were four full
    # read+write passes (~1.5 GB/iter at the bench shape) and the padding
    # tail holds valid sharings, so the finish arithmetic and the 2t open
    # pass through it with zero extra error counts.
    pa, oka = sim_ransha_fused(_key_data(ka), n, t, k, padded=packed)
    pb, okb = sim_ransha_fused(_key_data(kb), n, t, k, padded=packed)
    prt, pr2t, okr = sim_randousha_fused(_key_data(kr), n, t, k,
                                         padded=packed)
    k2 = 2 * t + 1
    run = _sim_reconstruct_packed_jit(n, 2 * t, False, True,
                                      fallback=False, replicate=False)
    if packed:
        # stay in the packed at-rest share format end to end (the same
        # 2x16-bit-limbs-per-word layout the open kernels consume and the
        # dealer stores at rest, ops/fused_open.pack_limbs), AND in the
        # extraction kernels' native 4D tensor layout [PL, n, n_outp, k]:
        # the finish kernels (mul_add_packed4 / sub_bcast_packed4) grid
        # over the tensors as stored, so the only reshape/retile left in
        # the whole finish is the one flattening z for the 2t open. The
        # flat-layout chain this replaces spent ~9 full HBM passes on
        # slices/retiles (~5.5 ms/iter at the bench shape).
        # Real triples are rows [:n-2t] of the n_outp axis; padding rows
        # hold the aggregated-check sharing and zero sharings (valid, so
        # the 2t open of z passes through them with zero errors).
        from ..ops.pallas_field import mul_add_packed4, sub_bcast_packed4
        PLh, _, n_outp, sp = pa.shape
        z = mul_add_packed4(pa, pb, pr2t)          # [PL, n, n_outp, sp]
        cntp = n_outp * sp
        pad = (-cntp) % k2
        zf = z.reshape(PLh, n, cntp)
        if pad:
            zf = jnp.concatenate(
                [zf, jnp.zeros((PLh, n, pad), jnp.uint32)], axis=-1)
        opened, nerr = run(zf)
        if opened.ndim == 3:
            opened = opened[:, 0]
        ok = oka & okb & okr & (jnp.sum(nerr) == 0)
        pab = sub_bcast_packed4(
            opened[:, :cntp].reshape(PLh, n_outp, sp), prt)
        return pa, pb, pab, ok
    cnt = pa.shape[-1]                              # k * (n - 2t)

    # z = a*b + r_2t, computed in the packed domain (one register kernel)
    from ..ops.pallas_field import mul_add_packed
    z = mul_add_packed(pa.reshape(pa.shape[0], -1),
                       pb.reshape(pa.shape[0], -1),
                       pr2t.reshape(pa.shape[0], -1)).reshape(pa.shape)
    pad = (-cnt) % k2
    zp = jnp.concatenate(
        [z, jnp.zeros(z.shape[:-1] + (pad,), jnp.uint32)], axis=-1) \
        if pad else z
    opened, nerr = run(zp)
    if opened.ndim == 3:
        # three-kernel fallback (direct kernel out of budget at this k)
        # returns the n-replicated per-party view
        opened = opened[:, 0]
    ok = oka & okb & okr & (jnp.sum(nerr) == 0)
    # every party's opened value is identical; the per-party ab shares
    # differ only through r_t, so broadcast at the subtract (writing the
    # n-replicated open was ~92 MB of pure HBM traffic at the bench shape)
    ab = mont.sub_mod(unpack_limbs(opened[:, None, :cnt]),
                      unpack_limbs(prt))
    return (FpArray(unpack_limbs(pa)), FpArray(unpack_limbs(pb)),
            FpArray(ab), ok)


def _key_data(key):
    kd = jnp.asarray(key)
    if jnp.issubdtype(kd.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    return kd.astype(jnp.uint32).reshape(2)


@lru_cache(maxsize=None)
def sim_offline_jit(program: str, n: int, t: int, k: int,
                    in_graph_fallback: bool = False):
    """ONE compiled SimBackend offline program per (program, n, t, k) —
    the backend is constructed INSIDE so the jit cache is keyed on the
    parameters, never on a backend object's identity (a fresh
    SimBackend per call would silently retrace+recompile).

    Default is DETECT-ONLY opens (in_graph_fallback=False): any decode
    error flips the ok flag and the batch is discarded — the offline
    protocols' abort semantics make in-graph Gao error correction dead
    weight (it tripled the program's runtime and its size risks the
    platform's sporadic large-program TPU-worker crash). Callers who
    want faults CORRECTED inside the compiled program (keeping batches
    under transmission faults that abort would discard) pass
    in_graph_fallback=True; host-level callers get robustness for free
    via the eager entry points' two-phase redo."""
    import os

    backend = SimBackend(n)
    from ..ops.fused_randousha import fused_fits
    if program == "generate_triples_packed":
        # packed-at-rest variant (bench + packed pools); requires the
        # fused pipeline
        assert fused_fits(n, t)
        return jax.jit(lambda key: fused_generate_triples(
            backend, n, t, k, key, packed=True))
    if (program in ("randousha", "generate_triples")
            and not in_graph_fallback
            and jax.default_backend() not in ("cpu",)
            and fused_fits(n, t)
            and not os.environ.get("HBMPC_NO_FUSED_OFFLINE")):
        ffn = {"randousha": fused_randousha,
               "generate_triples": fused_generate_triples}[program]
        return jax.jit(lambda key: ffn(backend, n, t, k, key))
    fn = {"randousha": randousha, "generate_triples": generate_triples,
          "generate_bits": generate_bits}[program]
    return jax.jit(lambda key: fn(backend, n, t, k, key, in_graph_fallback))


def sharded_offline_jit(program: str, mesh, n: int, t: int, k: int,
                        in_graph_fallback: bool = False):
    """The offline program under shard_map over a 'parties' mesh: one party
    per device, ICI collectives (MeshBackend). Each party's dealt secrets
    come from fold_in(key, party_id) — the replicated key stays secret-free
    per party exactly as each reference party draws its own randomness
    (offline_randousha.py:47-51). Returns a jitted fn(key) -> per-party
    outputs with a leading global party axis.

    Outputs: randousha -> (r_t [n, m], r_2t [n, m], ok [n]);
    generate_triples -> (a, b, ab [n, k], ok [n]); generate_bits ->
    (bits [n, m], ok [n])."""
    from jax.sharding import PartitionSpec as PS

    from ..parallel.mesh import MeshBackend

    backend = MeshBackend(n)
    fn = {"randousha": randousha, "generate_triples": generate_triples,
          "generate_bits": generate_bits}[program]

    def local_fn(key):
        key = jax.random.fold_in(key, jax.lax.axis_index("parties"))
        out = fn(backend, n, t, k, key, in_graph_fallback)
        arrs, ok = out[:-1], out[-1]
        return tuple(a.limbs[:, None] for a in arrs) + (ok[None],)

    nout = {"randousha": 2, "generate_triples": 3, "generate_bits": 1}[program]
    f = jax.shard_map(
        local_fn, mesh=mesh, in_specs=(PS(),),
        out_specs=tuple([PS(None, "parties", None)] * nout) + (PS("parties"),),
        check_vma=False)

    @jax.jit
    def run(key):
        out = f(key)
        return tuple(FpArray(a) for a in out[:-1]) + (out[-1],)

    return run
