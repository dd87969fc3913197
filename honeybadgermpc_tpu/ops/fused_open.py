"""Fully-fused single-chip n-party batch open: three Pallas kernels,
zero inter-kernel transposes.

The generic path (parallel/reconstruct.py) runs encode / all_to_all /
decode / all_gather / decode as separate XLA ops; on one chip the
collectives are transposes and the validation compares are extra passes
over 100+ MB intermediates, so the open is HBM-bound. This module fuses
the whole optimistic open for the SimBackend case:

  K1 encode:  shares viewed [L, n_src, k, C] -> predicted columns
              [L, n_src, n_dst, C] (one folded-band MXU matmul per
              (party, chunk-tile) grid step).
  K2 R1:      per (dst-tile, chunk-tile): interpolate psi_j(0) from the
              first k parties' columns AND validate the re-encoding
              against the other n-k columns IN KERNEL (mismatch counts
              out; predicted shares never touch HBM). The all_to_all is
              a BlockSpec index map into K1's output — no transpose.
  K3 R2:      per (chunk-tile, dst): decode S_c coefficients = secrets
              from the first k parties' psi values + in-kernel
              validation. The all_gather is again just an index map.

Chunking convention: share b <-> (i, c) with b = i*C + c (chunk c holds
secrets {i*C + c}), so shares [*, B] reshape to [*, k, C] views directly
and C pads to a lane multiple with zero chunks (zero is a valid
sharing). The reference chunks contiguously (batch_reconstruction.py:158)
— the grouping is a protocol-internal detail; all parties in one open
use the same convention and secrets return in input order.

Fault handling matches parallel/reconstruct.py::_decode_block: one
lax.cond falls back to the generic robust path (Gao) over the whole
batch when any mismatch is detected (reference IncrementalDecoder
semantics, reed_solomon.py:305-365).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import L, P, R_MOD_P, W
from .mxu_matmul import (NPLANES, PLANE_BITS, _fold_reduce, _interpret,
                         _rounds_for)

TB = 128            # chunk (lane) tile
JT = 8              # dst parties per K2/K3 grid step (sublane multiple)


def _round8(x: int) -> int:
    return -(-x // 8) * 8


# ---------------------------------------------------------------------------
# Host-exact folded bands (cf. mxu_matmul._folded_band_digits, but computed
# with Python ints: these matrices are per-(n, k) protocol constants)
# ---------------------------------------------------------------------------

def _folded_band_host(mat_int, rounds: int, ncp: int) -> np.ndarray:
    """mat_int: [k][ncols] plain-int matrix. Returns int8 band
    W[NPLANES*ncp, NPLANES*k] (ncp >= ncols, extra columns zero) with

      W[s*ncp + col, d*k + kk] = digit7_s(m[kk][col] * 2^(7d + 16*rounds)
                                          mod p)

    so that dotted against base-2^7 planes of Montgomery-form data a_mont
    the diagonals represent sum_k a_mont_k * m_k * 2^(16*rounds) — after
    `rounds` 16-bit REDC steps the result is (sum a_k m_k) in Montgomery
    form (the plain-int constant folds the R^{-1}/R pair away)."""
    k = len(mat_int)
    ncols = len(mat_int[0])
    assert ncp >= ncols
    band = np.zeros((NPLANES * ncp, NPLANES * k), np.int8)
    for kk in range(k):
        for col in range(ncols):
            for d in range(NPLANES):
                w = mat_int[kk][col] * pow(
                    2, PLANE_BITS * d + 16 * rounds, P) % P
                for s in range(NPLANES):
                    band[s * ncp + col, d * k + kk] = \
                        (w >> (PLANE_BITS * s)) & 0x7F
    return band


def _pad_band(band: np.ndarray, kcols: int) -> np.ndarray:
    if band.shape[1] < kcols:
        band = np.concatenate(
            [band, np.zeros((band.shape[0], kcols - band.shape[1]),
                            np.int8)], axis=1)
    return band[None]           # leading block axis for the BlockSpec


def _lam_int(xs, x0):
    out = []
    for j, xj in enumerate(xs):
        num, den = 1, 1
        for m_, xm in enumerate(xs):
            if m_ != j:
                num = num * (x0 - xm) % P
                den = den * (xj - xm) % P
        out.append(num * pow(den, P - 2, P) % P)
    return out


@functools.lru_cache(maxsize=None)
def _bands_np(points: tuple, k: int):
    """Folded int8 bands for the three kernels + layout metadata."""
    from .fpmatmul import _lagrange_int_rows
    n = len(points)
    nv = n - k
    rounds = _rounds_for(k)
    kcols = -(-(k * NPLANES) // 32) * 32

    # K1: encode matrix E[k][n]: E[i][j] = points[j]^i
    enc_mat = [[pow(int(points[j]), i, P) for j in range(n)]
               for i in range(k)]
    n1 = _round8(n)
    # K2: [lam(points[k:]) | lam_0] — re-evaluation at the validation
    # points FIRST (rows 0..nv-1 sublane-aligned), interpolate-at-0 last.
    xs = tuple(int(points[z]) % P for z in range(k))
    cols = [_lam_int(xs, int(points[z]) % P) for z in range(k, n)]
    cols.append(_lam_int(xs, 0))
    r1_mat = [[col[j] for col in cols] for j in range(k)]
    n2 = _round8(nv + 1)
    # K3: [Minv | lam(points[k:])] — coefficients then validation: k + nv
    rows = _lagrange_int_rows(xs)
    cols = [[rows[j][i] for j in range(k)] for i in range(k)]
    for z in range(k, n):
        cols.append(_lam_int(xs, int(points[z]) % P))
    r2_mat = [[col[j] for col in cols] for j in range(k)]
    n3 = _round8(k + nv)

    return ((_pad_band(_folded_band_host(enc_mat, rounds, n1), kcols), n1),
            (_pad_band(_folded_band_host(r1_mat, rounds, n2), kcols), n2),
            (_pad_band(_folded_band_host(r2_mat, rounds, n3), kcols), n3),
            rounds, kcols)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _planes_of(rows, k, kcols):
    """int8 [kcols, TB] base-2^7 planes of a canonical Montgomery limb
    block; `rows` maps limb index j -> uint32 [k, TB]."""
    blocks = []
    for d in range(NPLANES):
        j, r = divmod(PLANE_BITS * d, W)
        v = rows(j) >> r
        if r + PLANE_BITS > W and j + 1 < L:
            v = v | (rows(j + 1) << (W - r))
        blocks.append((v & jnp.uint32(0x7F)).astype(jnp.int8))
    if kcols > k * NPLANES:
        blocks.append(jnp.zeros((kcols - k * NPLANES, blocks[0].shape[-1]),
                                jnp.int8))
    return jnp.concatenate(blocks, axis=0)


def _band_dot_fold(w_blk, planes, ncp, rounds):
    """[NPLANES*ncp, kcols] @ [kcols, TB] -> L canonical limb arrays of
    shape [ncp, TB]."""
    d32 = jax.lax.dot_general(w_blk, planes, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    ds = [d32[s * ncp:(s + 1) * ncp] for s in range(NPLANES)]
    return _fold_reduce(ds, (ncp, TB), rounds)


def _k1_kernel(a_ref, w_ref, o_ref, *, k, n, ncp, kcols, rounds):
    """a_ref (L, 1, k, TB): one party's chunk coefficients;
    o_ref (L, 1, n, TB): its predicted columns at all n points."""
    planes = _planes_of(lambda j: a_ref[j, 0], k, kcols)
    out = _band_dot_fold(w_ref[0], planes, ncp, rounds)
    o_ref[...] = jnp.stack(out, axis=0)[:, None, :n]


def _mismatch(pred_rows, recv_rows):
    """pred/recv: limb index j -> uint32 [nv, TB]. int32 [TB]: number of
    validation points whose share differs in any limb."""
    diff = jnp.zeros(pred_rows(0).shape, jnp.uint32)
    for j in range(L):
        diff = diff | (pred_rows(j) ^ recv_rows(j))
    return jnp.sum((diff != 0).astype(jnp.int32), axis=0)


def _k2_kernel(a_ref, w_ref, vals_ref, errs_ref, *, k, n, ncp, kcols,
               rounds, jt):
    """a_ref (L, n, jt, TB): received columns for jt dst parties (rows
    0..k-1 feed the optimistic decode, k..n-1 validate);
    vals_ref (L, jt, TB): psi_j(0); errs_ref (jt, TB): mismatch counts."""
    nv = n - k
    for jj in range(jt):
        planes = _planes_of(lambda j, jj=jj: a_ref[j, :k, jj], k, kcols)
        out = _band_dot_fold(w_ref[0], planes, ncp, rounds)
        vals_ref[:, jj] = jnp.stack([out[j][nv] for j in range(L)], axis=0)
        errs_ref[jj] = _mismatch(
            lambda j: out[j][:nv],
            lambda j, jj=jj: a_ref[j, k:, jj])


def _k3_kernel(a_ref, w_ref, sec_ref, errs_ref, *, k, n, ncp, kcols,
               rounds, jt):
    """a_ref (L, n, TB): all parties' psi values for one chunk-tile (the
    sim all_gather — identical input for every dst in the tile; each of
    the jt dst parties still runs its own decode for simulation
    fidelity); sec_ref (L, jt, k, TB); errs_ref (jt, TB)."""
    nv = n - k
    for jj in range(jt):
        planes = _planes_of(lambda j: a_ref[j, :k], k, kcols)
        out = _band_dot_fold(w_ref[0], planes, ncp, rounds)
        sec_ref[:, jj] = jnp.stack([out[j][:k] for j in range(L)], axis=0)
        errs_ref[jj] = _mismatch(
            lambda j: out[j][k:k + nv], lambda j: a_ref[j, k:])


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _open_calls(n: int, k: int, cpad: int, points: tuple):
    (enc_b, n1), (r1_b, n2), (r2_b, n3), rounds, kcols = _bands_np(
        points, k)
    nc = cpad // TB
    nv = n - k

    k1 = pl.pallas_call(
        functools.partial(_k1_kernel, k=k, n=n, ncp=n1, kcols=kcols,
                          rounds=rounds),
        grid=(n, nc),
        in_specs=[
            pl.BlockSpec((L, 1, k, TB), lambda p, ci: (0, p, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPLANES * n1, kcols), lambda p, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, 1, n, TB), lambda p, ci: (0, p, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n, n, cpad), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * cpad * kcols * NPLANES * n1,
            bytes_accessed=4 * L * (n * cpad * (k + n)),
            transcendentals=0),
    )

    jt = JT if n % JT == 0 else 1
    njt = n // jt
    k2 = pl.pallas_call(
        functools.partial(_k2_kernel, k=k, n=n, ncp=n2, kcols=kcols,
                          rounds=rounds, jt=jt),
        grid=(njt, nc),
        in_specs=[
            pl.BlockSpec((L, n, jt, TB), lambda j, ci: (0, 0, j, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPLANES * n2, kcols),
                         lambda j, ci: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, jt, TB), lambda j, ci: (0, j, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jt, TB), lambda j, ci: (j, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, n, cpad), jnp.uint32),
            jax.ShapeDtypeStruct((n, cpad), jnp.int32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * cpad * kcols * NPLANES * n2,
            bytes_accessed=4 * L * (n * cpad * n),
            transcendentals=0),
    )

    k3 = pl.pallas_call(
        functools.partial(_k3_kernel, k=k, n=n, ncp=n3, kcols=kcols,
                          rounds=rounds, jt=jt),
        grid=(nc, njt),
        in_specs=[
            pl.BlockSpec((L, n, TB), lambda ci, j: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPLANES * n3, kcols), lambda ci, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, jt, k, TB), lambda ci, j: (0, j, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jt, TB), lambda ci, j: (j, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, n, k, cpad), jnp.uint32),
            jax.ShapeDtypeStruct((n, cpad), jnp.int32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * cpad * kcols * NPLANES * n3,
            bytes_accessed=4 * L * (n * cpad * (1 + k)),
            transcendentals=0),
    )

    enc_w = jnp.asarray(enc_b)
    r1_w = jnp.asarray(r1_b)
    r2_w = jnp.asarray(r2_b)

    def run(shares_kc):
        """[L, n, k, cpad] -> (secrets [L, n, k, cpad], nerr [n] int32)."""
        cols = k1(shares_kc, enc_w)
        vals, errs1 = k2(cols, r1_w)
        secrets, errs2 = k3(vals, r2_w)
        nerr = jnp.sum(errs1, axis=-1) + jnp.sum(errs2, axis=-1)
        return secrets, nerr

    run.parts = (k1, k2, k3, enc_w, r1_w, r2_w)   # profiling hooks
    return run


def sim_open_fused(shares_limbs, n: int, t: int, points: tuple,
                   robust: bool = True):
    """Optimistic fused open: shares [L, n, B] (B % (t+1) == 0) ->
    (secrets [L, n, B], nerr [n]). Falls back to the generic robust path
    (Gao) under lax.cond when any validation mismatch is seen."""
    k = t + 1
    B = shares_limbs.shape[-1]
    assert B % k == 0, (B, k)
    C = B // k
    cpad = -(-C // TB) * TB
    view = shares_limbs.reshape(shares_limbs.shape[:-1] + (k, C))
    if cpad != C:
        view = jnp.concatenate(
            [view, jnp.zeros(view.shape[:-1] + (cpad - C,), jnp.uint32)],
            axis=-1)

    run = _open_calls(n, k, cpad, tuple(int(x) % P for x in points))
    secrets, nerr = run(view)

    if robust:
        total = jnp.sum(nerr)

        def fast(_):
            return secrets, nerr

        def slow(_):
            # full robust path on the original layout: the generic
            # two-round program's Gao branch does the work under faults
            from ..parallel.mesh import SimBackend
            from ..parallel.reconstruct import batch_reconstruct
            from .fparray import FpArray
            sec2, nerr2 = batch_reconstruct(
                SimBackend(n), FpArray(shares_limbs), n, t, robust=True)
            s2 = sec2.limbs.reshape(sec2.limbs.shape[:-1] + (k, C))
            if cpad != C:
                s2 = jnp.concatenate(
                    [s2, jnp.zeros(s2.shape[:-1] + (cpad - C,),
                                   jnp.uint32)], axis=-1)
            return s2, nerr2

        secrets, nerr = jax.lax.cond(total == 0, fast, slow, operand=None)

    flat = secrets[..., :C].reshape(secrets.shape[:2] + (B,))
    return flat, nerr
