"""Batch reconstruction (the hot path) as a two-round collective program.

TPU redesign of the reference's batch_reconstruct
(honeybadgermpc/batch_reconstruction.py:88-227, call stack SURVEY §3.1) and
robust_reconstruction.py. The asyncio fetch-one/IncrementalDecoder machinery
becomes a synchronous SPMD program:

  R1: chunk own B shares into C = B/(t+1) polynomial chunks, encode at all n
      party points, ALL_TO_ALL the columns (the per-party send fan-out of
      batch_reconstruction.py:164-167 over ICI);
      each party robustly decodes its chunk-polynomials psi_j and evaluates
      at 0 -> S_c(x_j).
  R2: ALL_GATHER those values (the R2 constant broadcast :194-197); decode
      S_c (degree t) -> chunk coefficients = the secrets.

Fault tolerance: the optimistic path erasure-decodes from the first t+1
shares and validates against the rest (IncrementalDecoder's fast path,
reed_solomon.py:305-332); one lax.cond falls back to the Gao error-locating
decoder when any share disagrees — the whole batch pays the robust cost only
when faults actually occur.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import montgomery as mont
from ..ops.fparray import FpArray
from ..ops.gao import gao_robust_decode
from ..ops.rs import Encoding
from .mesh import MeshBackend, SimBackend


def _decode_block(enc: Encoding, ys: FpArray, k: int, robust: bool,
                  want_coeffs: bool = True, fallback: bool = True):
    """Decode from all-n shares ys[..., n] with the optimistic-then-Gao
    strategy. Returns (out, n_errors[...]) where out is the message coeffs
    [..., k] (want_coeffs) or the interpolant evaluated at 0 [...].

    The optimistic path is ONE matmul: interpolation from the first k
    shares fused with re-evaluation at the other n-k party points (the
    reference's decode + re-encode validation, reed_solomon.py:305-332)
    via a host-precomputed constant matrix."""
    n = enc.n
    from ..ops.fpmatmul import decode_validate_matmul

    fused = decode_validate_matmul(
        enc.points, k, FpArray(ys.limbs[..., :k]), want_coeffs)
    if want_coeffs:
        fast, reenc_rest = FpArray(fused.limbs[..., :k]), fused.limbs[..., k:]
    else:
        fast, reenc_rest = FpArray(fused.limbs[..., 0]), fused.limbs[..., 1:]

    if not robust:
        return fast, jnp.zeros(ys.shape[:-1], jnp.int32)

    # validation: predicted shares of parties k..n-1 vs the received ones
    agree = FpArray(reenc_rest).eq(FpArray(ys.limbs[..., k:]))
    if not fallback:
        # detect-only mode: report disagreement counts, let the HOST decide
        # to rerun robustly (the in-graph Gao fallback makes the compiled
        # program large enough to trip this platform's sporadic TPU-worker
        # crash; host-level two-phase opens avoid compiling it at all)
        errs = jnp.sum(~agree, axis=-1).astype(jnp.int32)
        return fast, errs
    all_ok = jnp.all(agree)

    # The Gao fallback's EEA state is ~10x the data size, and this jaxlib's
    # XLA:TPU crashes the worker outright somewhere above ~12k concurrent
    # EEA instances at n=64 (bisected: [64,192] batch fine, [64,224]
    # kills the TPU worker process). Flatten ALL batch axes and segment by
    # a fixed instance budget with lax.map (sequential, one segment live at
    # a time) — it is the rare faulty path, so its latency is irrelevant;
    # only peak memory / instance count matters.
    BUDGET = 4096

    def fallback(_):
        from .mesh import SimBackend  # noqa: F401 (doc cross-ref)
        limbs = ys.limbs                              # [L, *batch, n]
        lead = limbs.shape[0]
        bshape = limbs.shape[1:-1]
        nb = int(np.prod(bshape)) if bshape else 1
        seg = min(BUDGET, nb)
        nseg = -(-nb // seg)
        pad = nseg * seg - nb
        flat = limbs.reshape(lead, nb, n)
        if pad:
            # zero shares are a valid codeword: the padding decodes to the
            # zero polynomial with 0 errors and is sliced off below
            flat = jnp.concatenate(
                [flat, jnp.zeros((lead, pad, n), jnp.uint32)], axis=1)
        segs = jnp.moveaxis(flat.reshape(lead, nseg, seg, n), 1, 0)

        def seg_fn(seg_limbs):                        # [L, seg, n]
            coeffs, reenc2, ok = gao_robust_decode(
                enc, tuple(range(n)), FpArray(seg_limbs), k)
            errs = jnp.sum(~reenc2.eq(FpArray(seg_limbs)),
                           axis=-1).astype(jnp.int32)
            out = coeffs.limbs if want_coeffs else coeffs.limbs[..., 0]
            return out, errs

        out, errs = jax.lax.map(seg_fn, segs)        # [nseg, L, seg, (k)]
        out = jnp.moveaxis(out, 0, 1).reshape(
            (lead, nseg * seg) + ((k,) if want_coeffs else ()))[:, :nb]
        out = out.reshape((lead,) + bshape + ((k,) if want_coeffs else ()))
        errs = errs.reshape(nseg * seg)[:nb].reshape(bshape)
        return out, errs

    def fastpath(_):
        return fast.limbs, jnp.zeros(ys.shape[:-1], jnp.int32)

    limbs, errs = jax.lax.cond(all_ok, fastpath, fallback, operand=None)
    return FpArray(limbs), errs


def batch_reconstruct(backend, shares: FpArray, n: int, t: int,
                      use_omega_powers: bool = False, robust: bool = True,
                      fallback: bool = True):
    """Open a batch of B secrets from degree-t shares.

    ``shares``: per-party local [..., B] (SimBackend: leading party axis so
    [n, B]; MeshBackend inside shard_map: [B]). B must be a multiple of t+1
    (callers pad — preprocessing zeros are free).
    Returns (secrets [..., B] — every party gets all secrets — and
    total error count per party)."""
    k = t + 1
    B = shares.shape[-1]
    assert B % k == 0, f"batch {B} must be a multiple of t+1={k}"
    C = B // k
    enc = Encoding(n, use_omega_powers=use_omega_powers)

    # R1: encode chunk coefficients at all party points
    coeffs = shares.reshape(shares.shape[:-1] + (C, k))
    cols = enc.encode(coeffs)                    # [..., C, n]
    recv = backend.all_to_all(cols)              # [..., C, n] (psi_j shares)
    vals, err1 = _decode_block(enc, recv, t + 1, robust, want_coeffs=False,
                               fallback=fallback)
    # vals = psi_j(0) = S_c(x_j): [..., C]

    # R2: everyone shares its S_c(x_j); decode S_c -> secrets
    gathered = backend.all_gather(vals)          # [..., C, n]
    sec_coeffs, err2 = _decode_block(enc, gathered, k, robust,
                                     fallback=fallback)
    secrets = sec_coeffs.reshape(sec_coeffs.shape[:-2] + (B,))
    nerr = jnp.sum(err1, axis=-1) + jnp.sum(err2, axis=-1)
    return secrets, nerr


def robust_open_single(backend, share: FpArray, n: int, t: int,
                       use_omega_powers: bool = False, robust: bool = True):
    """Open scalar secrets (shares [..., S] treated pointwise): broadcast own
    share, robust-interpolate at 0 (reference robust_reconstruction.py:14 /
    mpc.py open_share :101). Far less efficient than batch_reconstruct —
    use for control values."""
    gathered = backend.all_gather(share)         # [..., S, n]
    enc = Encoding(n, use_omega_powers=use_omega_powers)
    vals, errs = _decode_block(enc, gathered, t + 1, robust,
                               want_coeffs=False)
    return vals, errs


@lru_cache(maxsize=None)
def _sim_reconstruct_packed_jit(n: int, t: int, use_omega_powers: bool,
                                robust: bool, fallback: bool = True,
                                replicate: bool = True):
    """Fused open over PACKED shares [PL, n, B] (the dealer's at-rest
    format) -> (secrets PACKED [PL, n, B], nerr). TPU fused path only —
    callers holding unpacked limbs use _sim_reconstruct_jit.

    fallback=False: validation error counts are still returned but the
    in-graph Gao fallback is NOT compiled in — the caller host-checks nerr
    and reruns robustly (see sim_batch_reconstruct). In this detect-only
    mode the single-kernel direct-composition open (bit-identical secrets
    and accept/reject, ops/fused_open_direct.py) replaces the three-kernel
    pipeline when its VMEM budget fits. replicate=False additionally
    returns ONE secrets copy [PL, B] instead of the n-replicated view
    (halves HBM traffic — see sim_open_direct_packed)."""
    from ..ops.fused_open_direct import direct_fits
    enc = Encoding(n, use_omega_powers=use_omega_powers)
    points = tuple(int(x) % mont.P for x in enc.points)

    if robust and not fallback and direct_fits(n, t + 1):
        @jax.jit
        def run_direct(packed):
            from ..ops.fused_open_direct import sim_open_direct_packed
            return sim_open_direct_packed(packed, n, t, points,
                                          replicate=replicate)

        return run_direct

    @jax.jit
    def run_packed(packed):
        from ..ops.fused_open import sim_open_fused_packed
        return sim_open_fused_packed(packed, n, t, points,
                                     robust=robust and fallback)

    return run_packed


@lru_cache(maxsize=None)
def _sim_reconstruct_jit(n: int, t: int, use_omega_powers: bool, robust: bool,
                         fallback: bool = True):
    """Cached jitted whole-open kernel for the SimBackend path. Essential:
    an eager call re-traces the lax.cond fallback branch every time, which
    costs more than the decode itself.

    On TPU the open runs as the fully-fused three-kernel pipeline
    (ops/fused_open.py: encode -> R1 decode+validate -> R2 decode+validate
    with BlockSpec-indexed collectives); the generic collective program
    below serves CPU tests and the fused path's robust fallback."""
    backend = SimBackend(n)
    import os as _os

    on_tpu = (jax.default_backend() not in ("cpu",)
              and not _os.environ.get("HBMPC_NO_FUSED_OPEN"))
    from ..ops.fused_open_direct import direct_fits

    if on_tpu and direct_fits(n, t + 1):
        # the direct kernel has no party-alignment constraint (the party
        # axis is a leading dim) and covers k up to KMAX_DIRECT = 128 —
        # this includes the reference benchmark grid's (4,1)/(7,2).
        # non-robust and detect-only modes run the bare direct kernel
        # (mismatches still counted in-dot); robust-with-fallback mode
        # (opens under an enclosing jit) adds the in-graph lax.cond
        enc = Encoding(n, use_omega_powers=use_omega_powers)
        points = tuple(int(x) % mont.P for x in enc.points)

        @jax.jit
        def run_direct(limbs):
            from ..ops.fused_open import pack_limbs
            from ..ops.fused_open_direct import sim_open_direct_packed
            # extra batch dims between party and B flatten into one open
            # axis (each trailing block is a multiple of t+1, so chunk
            # boundaries stay aligned) and restore after
            shp = limbs.shape                    # [L, n, *mid, B]
            if limbs.ndim > 3:
                limbs = limbs.reshape(shp[:2] + (-1,))
            sec, nerr = sim_open_direct_packed(pack_limbs(limbs), n, t,
                                               points,
                                               robust=robust and fallback)
            if len(shp) > 3:
                sec = sec.reshape(sec.shape[:2] + shp[2:])
            return sec, nerr

        run_direct.packed = True
        return run_direct

    # the three-kernel fused pipeline tiles dst parties in sublane groups
    # of 8 and uses the balanced base-256 digit scheme (k = t+1 <= 32)
    if on_tpu and n % 8 == 0 and t + 1 <= 32:
        enc = Encoding(n, use_omega_powers=use_omega_powers)
        points = tuple(int(x) % mont.P for x in enc.points)

        @jax.jit
        def run_fused(limbs):
            # returns secrets PACKED [PL, n, B] (fused_open storage form)
            from ..ops.fused_open import sim_open_fused
            return sim_open_fused(limbs, n, t, points,
                                  robust=robust and fallback)

        run_fused.packed = True
        return run_fused

    @jax.jit
    def run(limbs):
        secrets, nerr = batch_reconstruct(
            backend, FpArray(limbs), n, t, use_omega_powers, robust,
            fallback=fallback)
        return secrets.limbs, nerr

    return run


def sim_batch_reconstruct(shares: FpArray, n: int, t: int,
                          use_omega_powers: bool = False, robust: bool = True):
    """Jitted SimBackend batch open (shares [n, ..., B]).

    At the host level on TPU the robust path is TWO-PHASE: the dispatched
    program only detects faults (optimistic decode + validation counts) and
    a host check reruns the open through the segment-wise Gao redo when any
    share disagreed. Compiling the Gao fallback into the main program
    sporadically crashes this platform's TPU worker (jaxlib codegen bug,
    probability grows with program size), and two-phase also cuts the
    common-case compile by the whole robust branch. Under an enclosing jit
    (e.g. the MiMC scan) the in-graph lax.cond fallback is kept."""
    import jax.core
    traced = isinstance(shares.limbs, jax.core.Tracer)
    host_two_phase = (robust and not traced
                      and jax.default_backend() not in ("cpu",))
    run = _sim_reconstruct_jit(n, t, use_omega_powers, robust,
                               fallback=not host_two_phase)
    limbs, nerr = run(shares.limbs)
    if getattr(run, "packed", False):
        from ..ops.fused_open import unpack_limbs
        limbs = jax.jit(unpack_limbs)(limbs)
    if host_two_phase and int(jax.device_get(jnp.sum(nerr))) != 0:
        limbs, nerr = host_robust_redo(
            np.asarray(jax.device_get(shares.limbs)), n, t,
            use_omega_powers)
        limbs = jax.device_put(limbs)
    return FpArray(limbs), nerr


# ---------------------------------------------------------------------------
# Host-driven robust redo: the rare faulty path, built to survive this
# platform's sporadic TPU-worker crashes — every device program is small
# (one Gao segment), inputs live on the host, and crashed dispatches are
# retried after the worker restarts.
# ---------------------------------------------------------------------------

_REDO_SEG = 2048          # Gao instances per dispatch
_REDO_TRIES = 4


def _retry_get(fn, *args):
    import time as _time
    for attempt in range(_REDO_TRIES):
        try:
            return jax.device_get(fn(*args))
        except Exception as e:                        # jax.errors.JaxRuntimeError
            if "UNAVAILABLE" not in str(e) or attempt == _REDO_TRIES - 1:
                raise
            _time.sleep(10.0)                         # let the worker restart


@lru_cache(maxsize=None)
def _redo_encode_jit(n: int, use_omega_powers: bool, k: int):
    enc = Encoding(n, use_omega_powers=use_omega_powers)
    backend = SimBackend(n)

    @jax.jit
    def run(limbs):                                   # [L, n, B]
        C = limbs.shape[-1] // k
        coeffs = FpArray(limbs.reshape(limbs.shape[:-1] + (C, k)))
        return backend.all_to_all(enc.encode(coeffs)).limbs  # [L, n, C, n]

    return run


@lru_cache(maxsize=None)
def _redo_gao_jit(n: int, use_omega_powers: bool, k: int):
    enc = Encoding(n, use_omega_powers=use_omega_powers)

    @jax.jit
    def run(seg_limbs):                               # [L, SEG, n]
        coeffs, reenc, ok = gao_robust_decode(
            enc, tuple(range(n)), FpArray(seg_limbs), k)
        errs = jnp.sum(~reenc.eq(FpArray(seg_limbs)), axis=-1)
        return coeffs.limbs, errs.astype(jnp.int32)

    return run


def _redo_decode_round(flat_np, n, use_omega_powers, k):
    """flat_np [L, NB, n] host array -> (coeffs [L, NB, k], errs [NB])
    via segment-wise dispatch with crash retry."""
    L0, nb, _ = flat_np.shape
    seg = min(_REDO_SEG, nb)
    nseg = -(-nb // seg)
    gao = _redo_gao_jit(n, use_omega_powers, k)
    out = np.empty((L0, nb, k), np.uint32)
    errs = np.empty((nb,), np.int32)
    for s in range(nseg):
        lo = s * seg
        hi = min(lo + seg, nb)
        chunk = flat_np[:, lo:hi]
        if hi - lo < seg:                             # zero-pad: valid codeword
            chunk = np.concatenate(
                [chunk, np.zeros((L0, seg - (hi - lo), n), np.uint32)], 1)
        c, e = _retry_get(gao, chunk)
        out[:, lo:hi] = c[:, :hi - lo]
        errs[lo:hi] = e[:hi - lo]
    return out, errs


def host_robust_redo(shares_np: np.ndarray, n: int, t: int,
                     use_omega_powers: bool = False):
    """Full robust re-open of shares_np [L, n, B] (uint32 host array) with
    error correction up to (n-t-1)//2 wrong shares per decode. Returns
    (secrets [L, n, B] np, nerr [n] np). Mirrors batch_reconstruct's
    two-round structure; each decode is a small retried Gao dispatch."""
    k = t + 1
    L0, n_, B = shares_np.shape
    assert n_ == n and B % k == 0, (shares_np.shape, n, k)
    C = B // k

    recv = _retry_get(_redo_encode_jit(n, use_omega_powers, k),
                      shares_np)                      # [L, n, C, n]
    # R1: per-dst robust decode of psi_j shares
    flat = np.ascontiguousarray(recv).reshape(L0, n * C, n)
    co1, err1 = _redo_decode_round(flat, n, use_omega_powers, k)
    vals = co1[..., 0].reshape(L0, n, C)              # psi_j(0) = S_c(x_j)

    # R2 all_gather: every dst decodes the same psi vector (per-dst decodes
    # kept for simulation fidelity, like the fused K3 kernel)
    gathered = np.broadcast_to(
        np.moveaxis(vals, 1, 2)[:, None],             # [L, 1, C, n]
        (L0, n, C, n))
    flat2 = np.ascontiguousarray(gathered).reshape(L0, n * C, n)
    co2, err2 = _redo_decode_round(flat2, n, use_omega_powers, k)
    secrets = co2.reshape(L0, n, C, k).reshape(L0, n, B)

    nerr = (err1.reshape(n, C).sum(1) + err2.reshape(n, C).sum(1)) \
        .astype(np.int32)
    return secrets, nerr


def make_sharded_reconstruct(mesh, n: int, t: int,
                             use_omega_powers: bool = False,
                             robust: bool = True):
    """Build the jitted multi-chip reconstruction step: global shares
    [n, B] sharded over the 'parties' mesh axis -> (secrets [n, B], errors
    [n]). The program inside shard_map is identical to the SimBackend
    version; only the collectives differ (ICI all_to_all/all_gather)."""
    from jax.sharding import PartitionSpec as P

    backend = MeshBackend(n)

    def local_fn(limbs):                     # local [L, 1, B]
        shares = FpArray(limbs[:, 0])
        secrets, nerr = batch_reconstruct(
            backend, shares, n, t, use_omega_powers, robust)
        return secrets.limbs[:, None], nerr[None]

    f = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, "parties", None),),
        out_specs=(P(None, "parties", None), P("parties")),
        # the decode kernels' lax.scan carries start as replicated zeros and
        # become party-varying after absorbing data; skip the vma check
        # rather than threading pvary through every kernel
        check_vma=False,
    )

    @jax.jit
    def run(shares: FpArray):
        sec, nerr = f(shares.limbs)
        return FpArray(sec), nerr

    return run


def make_hybrid_reconstruct(mesh, n: int, t: int,
                            use_omega_powers: bool = False,
                            robust: bool = True):
    """Multi-chip reconstruction with MORE PARTIES THAN DEVICES: n parties
    over mesh's D devices, n/D simulated per device (HybridBackend — the
    deployment shape when a 64-party network runs on an 8-chip slice).
    Global shares [n, B] sharded contiguously on the party axis ->
    (secrets [n, B], errors [n]). Same program text as the SimBackend and
    MeshBackend paths; only the collective implementations differ."""
    from jax.sharding import PartitionSpec as P

    from .mesh import HybridBackend

    ndev = int(np.prod(mesh.devices.shape))
    backend = HybridBackend(n, ndev)

    def local_fn(limbs):                     # local [L, n/D, B]
        secrets, nerr = batch_reconstruct(
            backend, FpArray(limbs), n, t, use_omega_powers, robust)
        return secrets.limbs, nerr

    f = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, "parties", None),),
        out_specs=(P(None, "parties", None), P("parties")),
        check_vma=False,
    )

    @jax.jit
    def run(shares: FpArray):
        sec, nerr = f(shares.limbs)
        return FpArray(sec), nerr

    return run


def inject_share_faults(shares: FpArray, party_ids, fault_parties, key):
    """Fault injection for tests/benchmarks (config.py induce_faults /
    mpc.py:126-131): listed parties replace their shares with random field
    elements. party_ids: int32 array broadcastable to shares' party axis."""
    r = FpArray.rand(key, shares.shape)
    bad = jnp.zeros_like(party_ids, dtype=bool)
    for p in fault_parties:
        bad = bad | (party_ids == p)
    while bad.ndim < shares.ndim:
        bad = bad[..., None]
    return FpArray.select(jnp.broadcast_to(bad, shares.shape), r, shares)
