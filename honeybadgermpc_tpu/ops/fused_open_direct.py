"""Single-kernel direct simulation of the n-party batch open.

The three-kernel fused open (ops/fused_open.py) materializes the R1 column
exchange — an [n_src, n_dst, C] field tensor, ~3x the share data per round
— because it simulates each party's encode and decode as separate passes.
But on ONE chip the whole protocol is a deterministic linear map of the
share tensor, and the composition collapses:

  * cols[i, j, c]   = sum_m shares[i, m, c] x_j^m          (K1, src i)
  * psi_cj(0)       = sum_{i<k} lam0_i cols[i, j, c]       (K2, dst j)
                    = sum_m (sum_{i<k} lam0_i shares[i, m, c]) x_j^m
  * S_c coefficients (K3) = sum_{i<k} lam0_i shares[i, m, c] = u[m, c]

  so the opened secrets are u = lam0-contraction of the first k parties'
  shares — ONE k-length MXU contraction — and every downstream value
  (psi, S_c, all n parties' identical R2 outputs) is a function of u.

  * K2/K3 validation: dst j flags src z (z >= k) iff
        sum_m (w[z, m, c] - shares[z, m, c]) x_j^m != 0,
    where w[z] = lam_z-contraction of the first k parties' shares (the
    degree-t interpolant evaluated at x_z). Since a nonzero degree-<k
    polynomial is nonzero at >= n-k+1 of the n points, SOME mismatch is
    seen iff w[z] != shares[z] somewhere — i.e. the n shares do not lie
    on a degree-t polynomial. The direct kernel evaluates that predicate
    exactly: predict w[z] for all z in k..n-1 and compare with the
    received shares.

Both the secrets and the accept/reject decision are therefore BIT-EXACT
equal to the faithful three-kernel simulation (asserted in
tests/test_fused_open.py); what changes is per-party attribution of the
error counts: the faithful path charges mismatches to the detecting dst,
this path charges them to the offending src. Callers use the counts only
as a redo trigger (parallel/reconstruct.py two-phase host redo), where
`sum(nerr) > 0` agrees between the paths.

HBM traffic drops from ~8x to ~2x the share bytes: read shares once,
write one copy of the secrets; the replicated per-party output view is a
plain XLA broadcast. Compute drops ~8x: one [lam; lam0] band contraction
of length k instead of per-dst re-decodes.

This is a SIMULATION fast path only: the multi-chip path
(parallel/reconstruct.py::make_sharded_reconstruct) keeps the real
two-round collective program, and the host robust redo keeps the faithful
per-dst Gao decodes under faults.

Reference: honeybadgermpc/batch_reconstruction.py:88-227 (two-round
protocol), reed_solomon.py:305-332 (optimistic decode + re-encode
validation that this kernel's predicate mirrors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import P
from .mxu_matmul import _interpret
from .fused_open import (NBAL, PL, TB, _BAL_ROUNDS, _bal_bias,
                         _bal_fold_init, _band_dot_fold, _folded_band_host,
                         _lam_int, _pack16)

ZG = 8            # output columns per in-kernel dot group (sublane multiple)
_MAX_LANES = 4096  # mg*TB bound: keeps planes+d32 inside VMEM
# Contraction-length bound of the balanced base-256 digit scheme at k = 128:
# |diag| <= NBAL*k*128^2 = 2^26 (int32 accumulation headroom 2^31) and the
# 2-round REDC needs sum_r bias*256^r * 2 < p*2^32 ~ 2^287 (it is ~2^277).
# k = t+1 up to 128 covers the reference's Gao grid rows t in {33, 50, 100}
# and degree-2t openings well past n = 64.
KMAX_DIRECT = 128


def _fits_budget(n: int, k: int, mg: int, limit: int) -> bool:
    """VMEM budget for one (n, k, mg) kernel config: double-buffered share
    block + planes + d32 + bands + fold temps. Mosaic raises at compile
    time on chips with less VMEM, and callers keep the three-kernel fused
    path as the fallback."""
    kcols = -(-(k * NBAL) // 32) * 32
    lanes = mg * TB
    ngrp = -(-(n - k + 1) // ZG)
    ablk = 2 * PL * n * mg * TB * 4
    planes = kcols * lanes
    d32 = NBAL * ZG * lanes * 4
    band = ngrp * NBAL * ZG * kcols
    fold = 19 * ZG * lanes * 4 + (n - k + 8) * lanes * 4
    return ablk + planes + d32 + band + fold + (2 << 20) < limit


def _pick_cfg(n: int, k: int):
    """Choose the coefficient-lane split: the k chunk-coefficient lanes are
    processed in MG groups of mg, with the m axis ZERO-PADDED to kp = MG*mg
    (padded lanes decode zero shares to zero secrets and validate clean, so
    any k is supported — Mosaic restricts the blocked m axis to multiples
    of 8 or the full axis, NOT to divisors of k). Returns (MG, mg, kp) of
    the largest mg that fits the VMEM budget, or None.

    Budgets: the single-group (mg = k) path keeps the 28 MB empirical
    budget the r03 headline config (n=64, k=22, measured scoped ~16.8 MB)
    was tuned under; the multi-group path targets 14 MB — safely inside the
    16 MB scoped-vmem limit this platform's compiler enforces (an mg=32
    k=43 config with formula ~28 MB was rejected at 30.3 MB scoped)."""
    if n <= k or k > KMAX_DIRECT:
        return None
    if k * TB <= _MAX_LANES and _fits_budget(n, k, k, 28 << 20):
        return 1, k, k
    for mg in range(8 * (_MAX_LANES // (8 * TB)), 0, -8):
        if _fits_budget(n, k, mg, 14 << 20):
            return -(-k // mg), mg, -(-k // mg) * mg
    return None


def direct_fits(n: int, k: int) -> bool:
    return _pick_cfg(n, k) is not None


@functools.lru_cache(maxsize=None)
def _direct_band(points: tuple, k: int):
    """int8 band [ngrp, NBAL*ZG, kcols]: group g's ZG columns are the
    Lagrange rows predicting parties k+g*ZG.. (and, in the last group,
    the lam0 row computing the secrets), folded with the balanced base-256
    digit scheme of ops/fused_open.py."""
    n = len(points)
    nv = n - k
    xs = tuple(int(points[i]) % P for i in range(k))
    cols = [_lam_int(xs, int(points[z]) % P) for z in range(k, n)]
    cols.append(_lam_int(xs, 0))                  # u (secrets) row: col nv
    ngrp = -(-(nv + 1) // ZG)
    kcols = -(-(k * NBAL) // 32) * 32
    bands = []
    for g in range(ngrp):
        sub = cols[g * ZG:(g + 1) * ZG]
        sub = sub + [[0] * k] * (ZG - len(sub))
        mat = [[sub[c][i] for c in range(ZG)] for i in range(k)]
        b = _folded_band_host(mat, _BAL_ROUNDS, ZG)   # [NBAL*ZG, NBAL*k]
        if b.shape[1] < kcols:
            b = np.concatenate(
                [b, np.zeros((b.shape[0], kcols - b.shape[1]), np.int8)], 1)
        bands.append(b)
    return np.stack(bands), ngrp, kcols


def _direct_kernel(a_ref, w_ref, sec_ref, errs_ref, acc_ref, *, k, n, nv,
                   mg, kcols, init, bias, ngrp):
    """a_ref [PL, n, mg, TB] packed shares (m-group slice); w_ref
    [ngrp, NBAL*ZG, kcols]; sec_ref [PL, mg*TB] packed secrets for this
    (chunk-tile, m-group), lane order m_local*TB + c_local; errs_ref
    [round8(nv), 128] global mismatch counts (single revisited block);
    acc_ref scratch [round8(nv), mg*TB] accumulates across grid steps.

    All vector ops stay 2D and every reshape is a sublane->lane merge
    (the only shape cast Mosaic supports)."""
    from .fused_open import _planes_of_packed
    lanes = mg * TB
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    planes = _planes_of_packed(
        lambda w: a_ref[w, :k].reshape(k, lanes), k, kcols)

    for g in range(ngrp):
        out = _band_dot_fold(w_ref[g], planes, ZG, init, bias)
        packed = _pack16(out)                     # [PL, ZG, lanes]
        for jj in range(ZG):
            col = g * ZG + jj
            if col < nv:                          # predicted share of z=k+col
                diff = jnp.zeros((1, lanes), jnp.uint32)
                for w in range(PL):
                    diff = diff | (
                        packed[w, jj:jj + 1] ^
                        a_ref[w, k + col:k + col + 1].reshape(1, lanes))
                acc_ref[col:col + 1] = (acc_ref[col:col + 1] +
                                        (diff != 0).astype(jnp.int32))
            elif col == nv:                       # lam0 row: the secrets
                sec_ref[...] = packed[:, jj]

    # lane-reduce the running accumulator into the single errs block
    # (written every step; the final flush carries the global counts)
    red = acc_ref[:, 0:TB]
    for m in range(1, mg):
        red = red + acc_ref[:, m * TB:(m + 1) * TB]
    errs_ref[...] = red


@functools.lru_cache(maxsize=None)
def _direct_call(n: int, k: int, cpad: int, points: tuple):
    band_np, ngrp, kcols = _direct_band(points, k)
    nv = n - k
    MG, mg, kp = _pick_cfg(n, k)
    nc = cpad // TB
    lanes = mg * TB
    nvr = -(-nv // 8) * 8
    init = _bal_fold_init(k)
    bias = _bal_bias(k)

    call = pl.pallas_call(
        functools.partial(_direct_kernel, k=k, n=n, nv=nv, mg=mg,
                          kcols=kcols, init=init, bias=bias, ngrp=ngrp),
        grid=(nc, MG),
        in_specs=[
            pl.BlockSpec((PL, n, mg, TB), lambda ci, g: (0, 0, g, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngrp, NBAL * ZG, kcols), lambda ci, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PL, lanes), lambda ci, g: (0, ci * 1 + g * nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nvr, TB), lambda ci, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # lane-major secrets: [g][ci] blocks of (PL, mg*TB)
            jax.ShapeDtypeStruct((PL, MG * nc * lanes), jnp.uint32),
            jax.ShapeDtypeStruct((nvr, TB), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nvr, lanes), jnp.int32)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * cpad * k * kcols * NBAL * ZG * ngrp,
            bytes_accessed=4 * PL * cpad * k * (n + 1),
            transcendentals=0),
    )
    band = np.ascontiguousarray(band_np)

    def run(view):                                # [PL, n, kp, cpad]
        if kp != k:                               # pad m lanes (see _pick_cfg)
            view = jnp.concatenate(
                [view, jnp.zeros(view.shape[:2] + (kp - k, cpad),
                                 jnp.uint32)], axis=2)
        sec_flat, errs = call(view, band)
        # [PL, g, ci, m_local, TB] -> [PL, (g, m_local), (ci, TB)]
        sec = sec_flat.reshape(PL, MG, nc, mg, TB).transpose(0, 1, 3, 2, 4)
        return sec.reshape(PL, kp, cpad)[:, :k], errs

    return run, nv


def sim_open_direct_packed(packed, n: int, t: int, points: tuple,
                           robust: bool = False, replicate: bool = True):
    """Direct-composition open on PACKED shares [PL, n, B] (B % (t+1) == 0)
    -> (secrets PACKED [PL, n, B] — the per-party replicated view — and
    nerr [n] int32, mismatches charged to the offending SOURCE party;
    parties 0..t report 0).

    replicate=False returns ONE copy of the secrets [PL, B] instead of the
    n-replicated per-party view. Every party's opened values are identical
    by construction (they decode the same gathered R2 vector), so the
    replicated view is pure simulation bookkeeping — and materializing it
    is half this kernel's HBM traffic (write n*32 B per opened share vs 32;
    the n-party share READ, 2 KB/share at n=64, is the protocol's real
    data and stays). Only valid with robust=False (the fallback branch
    produces the replicated layout).

    robust=False (detect-only): callers rerun through
    parallel/reconstruct.py::host_robust_redo when sum(nerr) > 0.
    robust=True: one lax.cond falls back to the generic two-round robust
    program (Gao error correction) when any mismatch is seen — for opens
    living inside an enclosing jit (e.g. the MiMC round scan) where a
    host-level two-phase redo is impossible."""
    assert replicate or not robust, "single-copy output is detect-only"
    k = t + 1
    B = packed.shape[-1]
    assert B % k == 0, (B, k)
    C = B // k
    cpad = -(-C // TB) * TB
    view = packed.reshape(PL, n, k, C)
    if cpad != C:
        view = jnp.concatenate(
            [view, jnp.zeros(view.shape[:-1] + (cpad - C,), jnp.uint32)],
            axis=-1)

    run, nv = _direct_call(n, k, cpad, tuple(int(x) % P for x in points))
    sec, errs = run(view)                         # [PL,k,cpad], [nvr,TB]

    nerr = jnp.concatenate(
        [jnp.zeros((k,), jnp.int32), jnp.sum(errs[:nv], axis=-1)])
    if not replicate:
        return sec[:, :, :C].reshape(PL, B), nerr
    secrets = jnp.broadcast_to(
        sec[:, None, :, :C], (PL, n, k, C)).reshape(PL, n, B)

    if robust:
        from .fused_open import pack_limbs, unpack_limbs

        def fast(_):
            return secrets, nerr

        def slow(_):
            from ..parallel.mesh import SimBackend
            from ..parallel.reconstruct import batch_reconstruct
            from .fparray import FpArray
            sec2, nerr2 = batch_reconstruct(
                SimBackend(n), FpArray(unpack_limbs(packed)), n, t,
                robust=True)
            return pack_limbs(sec2.limbs), nerr2

        secrets, nerr = jax.lax.cond(
            jnp.sum(nerr) == 0, fast, slow, operand=None)
    return secrets, nerr
