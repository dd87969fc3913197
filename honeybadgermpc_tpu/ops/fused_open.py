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

from .limbs import L, P, W
from .mxu_matmul import _interpret

TB = 128            # chunk (lane) tile
JT = 8              # dst parties per K2/K3 grid step (sublane multiple)
PL = 8              # packed limb rows: two 16-bit limbs per uint32

# This chip class is HBM-bound on the open (the three kernels' compute
# overlaps a ~400-700 MB traffic budget), so every inter-kernel tensor and
# the final secrets are stored PACKED — limb 2j in the low half of word j,
# limb 2j+1 in the high half. Byte/digit extraction reads packed words
# directly; packing costs 8 ORs at the end of the epilogue.


def _round8(x: int) -> int:
    return -(-x // 8) * 8


# ---------------------------------------------------------------------------
# Balanced base-256 digit scheme (k <= 64)
#
# Both operands decompose into 32 SIGNED digits in [-128, 127] (any value
# < p fits: p's top byte is 0x73, so the balanced carry never spills into a
# 33rd digit). vs the unsigned 7-bit scheme this cuts the plane count from
# 37 to 32 on BOTH matmul axes (0.73x the MACs). Signedness is handled
# without any in-kernel branching:
#   * each int32 diagonal (|diag| <= NBAL*k*128^2, < 2^26 for k <= 64)
#     gets a +bias(k) offset so the carry-save fold stays unsigned;
#   * the fold's accumulator is INITIALIZED with the 16-bit limbs of
#     I = M*p - sum_r bias * 256^r  (M chosen so every reachable value
#     stays nonnegative), which cancels the bias mod p;
#   * two REDC rounds bring the result under 2p — a single conditional
#     subtract finishes. (Headroom check: |V| <= sum_r bias*256^r ~ 2^275
#     even at k=64, and the 2-round REDC needs total < p*2^32 ~ 2^287.)
#
# k here is the matmul contraction length (points per decode / coeffs per
# encode); k <= 64 covers degree-2t openings at n = 64 (k = 2t+1 = 43).
# ---------------------------------------------------------------------------

NBAL = 32
_BAL_ROUNDS = 2
KMAX = 64


def _bal_bias(k: int) -> int:
    """Max |diagonal|: NBAL*k products of balanced digits (|.| <= 2^14)."""
    return NBAL * k * (1 << 14)


def _bal_digits(x: int):
    """Balanced base-256 digits of 0 <= x < p (32 signed digits)."""
    out = []
    c = 0
    for _ in range(NBAL):
        u = (x & 0xFF) + c
        x >>= 8
        if u >= 128:
            out.append(u - 256)
            c = 1
        else:
            out.append(u)
            c = 0
    assert x == 0 and c == 0
    return out


def _bal_fold_init(k: int):
    """16-bit limbs of I = M*p - B0 (see scheme comment); M covers both the
    per-diagonal bias sum B0 and the most negative reachable value
    (|V| <= B0 by construction of bias(k))."""
    b0 = sum(_bal_bias(k) * (1 << (8 * r)) for r in range(NBAL))
    m = 2 * -(-b0 // P)
    i_val = m * P - b0
    assert i_val >= 0
    limbs = []
    for _ in range(19):
        limbs.append(i_val & 0xFFFF)
        i_val >>= 16
    assert i_val == 0
    return tuple(limbs)


# ---------------------------------------------------------------------------
# Host-exact folded bands (cf. mxu_matmul._folded_band_digits, but computed
# with Python ints: these matrices are per-(n, k) protocol constants)
# ---------------------------------------------------------------------------

def _folded_band_host(mat_int, rounds: int, ncp: int) -> np.ndarray:
    """mat_int: [k][ncols] plain-int matrix. Returns int8 band
    W[NBAL*ncp, NBAL*k] (ncp >= ncols, extra columns zero) with

      W[r*ncp + col, s*k + kk] = baldigit_r(m[kk][col] * 256^s
                                            * 2^(16*rounds) mod p)

    so that dotted against balanced base-256 planes of Montgomery-form
    data a_mont the diagonals represent sum_k a_mont_k * m_k *
    2^(16*rounds) — after `rounds` 16-bit REDC steps the result is
    (sum a_k m_k) in Montgomery form (the plain-int constant folds the
    R^{-1}/R pair away)."""
    k = len(mat_int)
    ncols = len(mat_int[0])
    assert ncp >= ncols
    band = np.zeros((NBAL * ncp, NBAL * k), np.int8)
    for kk in range(k):
        for col in range(ncols):
            for s in range(NBAL):
                w = mat_int[kk][col] * pow(
                    2, 8 * s + 16 * rounds, P) % P
                dig = _bal_digits(w)
                for r in range(NBAL):
                    band[r * ncp + col, s * k + kk] = dig[r]
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
    assert k <= KMAX, (k, "balanced scheme requires k <= 64")
    rounds = _BAL_ROUNDS
    kcols = -(-(k * NBAL) // 32) * 32

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

def _balance_bytes(us, k, kcols):
    """us: NBAL byte arrays (int32, [k, TBC]) -> int8 [kcols, TBC] balanced
    planes via the sequential carry chain: d_s = byte_s + c, minus 256
    when >= 128."""
    blocks = []
    c = None
    for s in range(NBAL):
        t = us[s] if c is None else us[s] + c
        ge = (t >= 128).astype(jnp.int32)
        blocks.append((t - (ge << 8)).astype(jnp.int8))
        c = ge
    if kcols > k * NBAL:
        blocks.append(jnp.zeros((kcols - k * NBAL,) + blocks[0].shape[1:],
                                jnp.int8))
    return jnp.concatenate(blocks, axis=0)


def _planes_of(rows, k, kcols):
    """Balanced planes from UNPACKED limbs; `rows` maps limb index j ->
    uint32 [k, TBC] (16-bit values)."""
    us = [((rows(s // 2) >> (8 * (s % 2))) & jnp.uint32(0xFF)).astype(
        jnp.int32) for s in range(NBAL)]
    return _balance_bytes(us, k, kcols)


def _planes_of_packed(rows, k, kcols):
    """Balanced planes from PACKED words; `rows` maps word index w ->
    uint32 [k, TBC] (full 32-bit, 4 bytes each)."""
    us = [((rows(s // 4) >> (8 * (s % 4))) & jnp.uint32(0xFF)).astype(
        jnp.int32) for s in range(NBAL)]
    return _balance_bytes(us, k, kcols)


def _pack16(limbs):
    """L 16-bit limb arrays -> PL packed uint32 arrays (stacked axis 0)."""
    return jnp.stack([limbs[2 * j] | (limbs[2 * j + 1] << 16)
                      for j in range(PL)], axis=0)


def _fold_reduce_bal(ds, shape, init_limbs, bias):
    """NBAL signed int32 diagonal arrays (8-bit spacing, |d| <= bias) ->
    L canonical Montgomery limb arrays. Per-diagonal +2^24 bias keeps the
    carry-save fold unsigned; `init_limbs` (16-bit limbs of M*p - B0)
    cancels the bias mod p and floors the value at >= 0. Two REDC rounds,
    one conditional subtract (see the scheme comment above)."""
    from .mxu_matmul import _P as _PL, _redc_step
    NL = 19
    t = [jnp.full(shape, jnp.uint32(init_limbs[j])) for j in range(NL)]
    for r in range(NBAL):
        d = (ds[r] + jnp.int32(bias)).astype(jnp.uint32)   # < 2*bias <= 2^26
        j, off = divmod(8 * r, W)
        if off == 0:                       # 16-bit aligned: 2 chunks
            t[j] = t[j] + (d & jnp.uint32(0xFFFF))
            t[j + 1] = t[j + 1] + (d >> 16)
        else:                              # *2^8: 3 chunks
            t[j] = t[j] + ((d << 8) & jnp.uint32(0xFFFF))
            t[j + 1] = t[j + 1] + ((d >> 8) & jnp.uint32(0xFFFF))
            if j + 2 < NL:
                t[j + 2] = t[j + 2] + (d >> 24)
    for _ in range(_BAL_ROUNDS):
        t = _redc_step(t, shape)
    # value < 2p: carry-normalize and subtract p at most once
    c = jnp.zeros(shape, jnp.uint32)
    out = []
    for j in range(L):
        v = t[j] + c
        out.append(v & jnp.uint32(0xFFFF))
        c = v >> 16
    hi = c + t[L]
    borrow = jnp.zeros(shape, jnp.uint32)
    d2 = []
    for j in range(L):
        v = out[j] - jnp.uint32(_PL[j]) - borrow
        d2.append(v & jnp.uint32(0xFFFF))
        borrow = (v >> 16) & jnp.uint32(1)
    take = (hi != 0) | (borrow == 0)
    return [jnp.where(take, d2[j], out[j]) for j in range(L)]


def _band_dot_fold(w_blk, planes, ncp, init_limbs, bias):
    """[NBAL*ncp, kcols] @ [kcols, TBC] -> L canonical limb arrays of
    shape [ncp, TBC]."""
    if _interpret():
        # stock XLA:CPU miscompiles small s8xs8->s32 dots (naive-loop
        # emitter adds i8 into i32 without a convert); widen on host
        w_blk, planes = w_blk.astype(jnp.int32), planes.astype(jnp.int32)
    d32 = jax.lax.dot_general(w_blk, planes, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    ds = [d32[r * ncp:(r + 1) * ncp] for r in range(NBAL)]
    return _fold_reduce_bal(ds, (ncp, planes.shape[-1]), init_limbs, bias)


def _mismatch(pred_words, recv_words):
    """pred/recv: packed word index w -> uint32 [nv, TBC]. int32 [TBC]:
    number of validation points whose share differs in any word."""
    diff = jnp.zeros(pred_words(0).shape, jnp.uint32)
    for w in range(PL):
        diff = diff | (pred_words(w) ^ recv_words(w))
    return jnp.sum((diff != 0).astype(jnp.int32), axis=0)


# ---------------------------------------------------------------------------
# Kernels. DMA-contiguity-tiled layouts (each grid step reads/writes ONE
# mostly-contiguous HBM region; the measured floor here is ~60 GB/s read /
# ~116 GB/s r+w and fragmented blocks run at a third of that):
#
#   shares  [n, ncg, PL, k, NCT, TB]        K1 in block contiguous
#   cols    [nc, njt, PL, n, jt, TB]        K2 in block (1,1,PL,n,jt,TB)
#                                           contiguous 2 MB; K1 writes it
#                                           in jt*TB (4 KB) fragments
#   vals    [PL, n, cpad]                   K3 in: FULL-RESIDENT in VMEM
#   secrets [nc, njt, PL, jt, k, TB]        K3 out block contiguous
#
# and lane-concatenation: K1 merges NCT chunk tiles and K2 merges the jt
# dst parties into the matmul lane axis (one [M,kcols]@[kcols,~1k] MXU dot
# per grid step instead of jt/NCT narrow N=128 dots), via the in-kernel
# sublane->lane reshape (k, g, TB) -> (k, g*TB), which Mosaic supports
# (unlike int8 lane-concat of misaligned slices).
# ---------------------------------------------------------------------------


def _k1_kernel(a_ref, w_ref, o_ref, *, k, n, ncp, kcols, init, bias, jt, nct):
    """a_ref (1, 1, PL, k, NCT, TB) PACKED: one party's chunk coefficients
    for NCT lane-tiles; o_ref (NCT, njt, PL, 1, jt, TB) PACKED: its
    predicted columns at all n points."""
    njt = n // jt
    planes = _planes_of_packed(
        lambda w: a_ref[0, 0, w].reshape(k, nct * TB), k, kcols)
    out = _band_dot_fold(w_ref[0], planes, ncp, init, bias)
    packed = _pack16(out)                            # [PL, ncp, NCT*TB]
    for ct in range(nct):
        sl = slice(ct * TB, (ct + 1) * TB)
        for j in range(njt):
            o_ref[ct, j, :, 0] = packed[:, j * jt:(j + 1) * jt, sl]


def _k2_kernel(a_ref, w_ref, vals_ref, errs_ref, *, k, n, ncp, kcols,
               init, bias, jt):
    """a_ref (1, 1, PL, n, jt, TB) PACKED: received columns for jt dst
    parties (rows 0..k-1 feed the optimistic decode, k..n-1 validate);
    one wide dot decodes all jt dsts. vals_ref (PL, jt, TB) PACKED:
    psi_j(0); errs_ref (jt, TB)."""
    nv = n - k
    planes = _planes_of_packed(
        lambda w: a_ref[0, 0, w, :k].reshape(k, jt * TB), k, kcols)
    out = _band_dot_fold(w_ref[0], planes, ncp, init, bias)
    packed = _pack16(out)                            # [PL, ncp, jt*TB]
    for jj in range(jt):
        sl = slice(jj * TB, (jj + 1) * TB)
        vals_ref[:, jj] = packed[:, nv, sl]
        errs_ref[jj] = _mismatch(
            lambda w, sl=sl: packed[w, :nv, sl],
            lambda w, jj=jj: a_ref[0, 0, w, k:, jj])


def _k3_kernel(a_ref, w_ref, sec_ref, errs_ref, *, k, n, ncp, kcols,
               init, bias, jt):
    # errs_ref is (1, 8, TB) — rows jt..7 are padding when jt < 8
    """a_ref (PL, n, cpad) PACKED, full-resident: all parties' psi values
    (the sim all_gather — identical input for every dst; each of the jt
    dst parties still runs its own decode for simulation fidelity, as jt
    lane-replicated copies in one wide dot); sec_ref (1, 1, PL, jt, k, TB)
    PACKED; errs_ref (jt, TB)."""
    nv = n - k
    ci = pl.program_id(0)
    lane = pl.ds(ci * TB, TB)
    p1 = _planes_of_packed(lambda w: a_ref[w, :k, lane], k, kcols)
    planes = jnp.broadcast_to(
        p1[:, None, :], (kcols, jt, TB)).reshape(kcols, jt * TB)
    out = _band_dot_fold(w_ref[0], planes, ncp, init, bias)
    packed = _pack16(out)                            # [PL, ncp, jt*TB]
    for jj in range(jt):
        sl = slice(jj * TB, (jj + 1) * TB)
        sec_ref[0, 0, :, jj] = packed[:, :k, sl]
        errs_ref[0, jj] = _mismatch(
            lambda w, sl=sl: packed[w, k:k + nv, sl],
            lambda w: a_ref[w, k:, lane])
    for jj in range(jt, 8):
        errs_ref[0, jj] = jnp.zeros((TB,), jnp.int32)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _open_calls(n: int, k: int, cpad: int, points: tuple):
    (enc_b, n1), (r1_b, n2), (r2_b, n3), _rounds, kcols = _bands_np(
        points, k)
    nc = cpad // TB
    nct = 3 if nc % 3 == 0 else (2 if nc % 2 == 0 else 1)
    ncg = nc // nct
    init = _bal_fold_init(k)
    bias = _bal_bias(k)
    jt = JT if n % JT == 0 else n
    njt = n // jt
    # K3's dot intermediate is [NBAL*n3, jt*TB] i32; at k > 32 halve the
    # dst group so it stays inside VMEM
    jt3 = jt if (k <= 32 or jt <= 4) else jt // 2
    njt3 = n // jt3

    k1 = pl.pallas_call(
        functools.partial(_k1_kernel, k=k, n=n, ncp=n1, kcols=kcols,
                          init=init, bias=bias, jt=jt, nct=nct),
        grid=(n, ncg),
        in_specs=[
            pl.BlockSpec((1, 1, PL, k, nct, TB),
                         lambda p, cg: (p, cg, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n1, kcols), lambda p, cg: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nct, njt, PL, 1, jt, TB),
                               lambda p, cg: (cg, 0, 0, p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, njt, PL, n, jt, TB),
                                       jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * cpad * kcols * NBAL * n1,
            bytes_accessed=4 * n * cpad * PL * (k + n),
            transcendentals=0),
    )

    k2 = pl.pallas_call(
        functools.partial(_k2_kernel, k=k, n=n, ncp=n2, kcols=kcols,
                          init=init, bias=bias, jt=jt),
        grid=(njt, nc),
        in_specs=[
            pl.BlockSpec((1, 1, PL, n, jt, TB),
                         lambda j, ci: (ci, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n2, kcols),
                         lambda j, ci: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PL, jt, TB), lambda j, ci: (0, j, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jt, TB), lambda j, ci: (j, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PL, n, cpad), jnp.uint32),
            jax.ShapeDtypeStruct((n, cpad), jnp.int32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * cpad * kcols * NBAL * n2,
            bytes_accessed=4 * PL * (n * cpad * n),
            transcendentals=0),
    )

    k3 = pl.pallas_call(
        functools.partial(_k3_kernel, k=k, n=n, ncp=n3, kcols=kcols,
                          init=init, bias=bias, jt=jt3),
        grid=(nc, njt3),
        in_specs=[
            pl.BlockSpec((PL, n, cpad), lambda ci, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * n3, kcols), lambda ci, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, PL, jt3, k, TB),
                         lambda ci, j: (ci, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TB), lambda ci, j: (j, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, njt3, PL, jt3, k, TB), jnp.uint32),
            jax.ShapeDtypeStruct((njt3, 8, cpad), jnp.int32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * cpad * kcols * NBAL * n3,
            bytes_accessed=4 * PL * (n * cpad * (1 + k)),
            transcendentals=0),
    )

    # keep these as host numpy: _open_calls is lru-cached across jit
    # traces, and a jnp.asarray() materialized INSIDE one trace is a
    # tracer — caching it leaks it into the next trace
    enc_w = np.ascontiguousarray(enc_b)
    r1_w = np.ascontiguousarray(r1_b)
    r2_w = np.ascontiguousarray(r2_b)

    def tile_in(packed):
        """packed [PL, n, k*cpad] -> [n, ncg, PL, k, NCT, TB]."""
        v = packed.reshape(PL, n, k, ncg, nct, TB)
        return v.transpose(1, 3, 0, 2, 4, 5)

    def untile_out(sec):
        """[nc, njt3, PL, jt3, k, TB] -> packed [PL, n, k*cpad]."""
        v = sec.reshape(ncg, nct, njt3, PL, jt3, k, TB)
        v = v.transpose(3, 2, 4, 5, 0, 1, 6)   # [PL,njt3,jt3,k,ncg,NCT,TB]
        return v.reshape(PL, n, k * cpad)

    def run(packed_kc):
        """packed [PL, n, k*cpad] -> (secrets packed [PL, n, k*cpad],
        nerr [n] int32)."""
        sh6 = tile_in(packed_kc)
        cols = k1(sh6, enc_w)
        vals, errs1 = k2(cols, r1_w)
        sec, errs2 = k3(vals, r2_w)
        # errs2 rows jt3..7 are padding; real parties are [:, :jt3]
        e2 = jnp.sum(errs2[:, :jt3], axis=-1).reshape(n)
        nerr = jnp.sum(errs1, axis=-1) + e2
        return untile_out(sec), nerr

    run.parts = (k1, k2, k3, enc_w, r1_w, r2_w)   # profiling hooks
    return run


def pack_limbs(limbs):
    """[L, ...] 16-bit uint32 limbs -> [PL, ...] packed words (XLA op)."""
    return jnp.stack([limbs[2 * j] | (limbs[2 * j + 1] << 16)
                      for j in range(PL)], axis=0)


def unpack_limbs(packed):
    """[PL, ...] packed words -> [L, ...] 16-bit uint32 limbs (XLA op)."""
    rows = []
    for w in range(PL):
        rows.append(packed[w] & jnp.uint32(0xFFFF))
        rows.append(packed[w] >> 16)
    return jnp.stack(rows, axis=0)


def sim_open_fused_packed(packed, n: int, t: int, points: tuple,
                          robust: bool = True):
    """Optimistic fused open on PACKED shares [PL, n, B] (the dealer's
    at-rest share format; B % (t+1) == 0) -> (secrets PACKED [PL, n, B],
    nerr [n]). Falls back to the generic robust path (Gao) under lax.cond
    when any validation mismatch is seen. Unpack with unpack_limbs()."""
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

    run = _open_calls(n, k, cpad, tuple(int(x) % P for x in points))
    secrets, nerr = run(view.reshape(PL, n, k * cpad))
    secrets = secrets.reshape(PL, n, k, cpad)

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
                SimBackend(n), FpArray(unpack_limbs(packed)), n, t,
                robust=True)
            s2 = pack_limbs(sec2.limbs).reshape((PL,) + (n, k, C))
            if cpad != C:
                s2 = jnp.concatenate(
                    [s2, jnp.zeros(s2.shape[:-1] + (cpad - C,),
                                   jnp.uint32)], axis=-1)
            return s2, nerr2

        secrets, nerr = jax.lax.cond(total == 0, fast, slow, operand=None)

    flat = secrets[..., :C].reshape(secrets.shape[:2] + (B,))
    return flat, nerr


def sim_open_fused(shares_limbs, n: int, t: int, points: tuple,
                   robust: bool = True):
    """Optimistic fused open: shares [L, n, B] (B % (t+1) == 0) ->
    (secrets PACKED [PL, n, B], nerr [n]). See sim_open_fused_packed."""
    return sim_open_fused_packed(pack_limbs(shares_limbs), n, t, points,
                                 robust=robust)
