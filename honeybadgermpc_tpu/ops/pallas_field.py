"""Pallas TPU kernels for GF(p) Montgomery arithmetic — the hot-op path.

The XLA/jnp kernels in ops/montgomery.py express the carry-save CIOS with
limb-axis concatenates, which Mosaic/XLA cannot fuse: every multiply round-
trips its [L+1, batch] accumulator through HBM (measured: the n=64 batch
open ran at ~1.5k shares/s). These kernels keep the entire CIOS in VMEM
registers — per-limb values are separate [TM, 128] vector registers, the
i/j loops are Python-unrolled, and HBM traffic is exactly inputs + outputs.

Kernels:
  mont_mul_pallas     — elementwise a*b*R^-1 mod p over flattened elements
  fp_matmul_pallas    — [B, k] @ [k, n] with the whole k-contraction and
                        modular accumulation inside the kernel (the
                        Vandermonde encode/decode workhorse)

Both are bit-exact against the jnp path (tests/test_pallas_field.py) and
dispatched automatically on TPU backends (montgomery.mont_mul / fpmatmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import L, MASK, N0, P_LIMBS, W

_P = [int(x) for x in P_LIMBS]
LANES = 128
SUBS = 8
TILE = SUBS * LANES          # elements per grid step


def _interpret() -> bool:
    """Interpret mode on non-TPU backends (CPU parity tests)."""
    return jax.default_backend() in ("cpu",)


def _cios(a_limbs, b_limbs, shape):
    """Register CIOS: a_limbs/b_limbs are Python lists of L uint32 arrays
    (each of `shape`); returns list of L canonical limb arrays < 2^16.
    Carry-save accumulator, limbs < 2^23 (see ops/montgomery.py proof)."""
    zero = jnp.zeros(shape, jnp.uint32)
    t = [zero] * (L + 1)
    for i in range(L):
        ai = a_limbs[i]
        for j in range(L):
            pr = ai * b_limbs[j]
            t[j] = t[j] + (pr & MASK)
            t[j + 1] = t[j + 1] + (pr >> W)
        m = ((t[0] & MASK) * jnp.uint32(N0)) & MASK
        for j in range(L):
            pr = m * jnp.uint32(_P[j])
            t[j] = t[j] + (pr & MASK)
            t[j + 1] = t[j + 1] + (pr >> W)
        carry0 = t[0] >> W
        t = t[1:] + [zero]
        t[0] = t[0] + carry0
    return _normalize(t, shape)


def _normalize(t, shape):
    """Carry-propagate L+1 redundant limbs (< 2^23) to canonical, then
    conditionally subtract p (value < 2p < 2^256)."""
    c = jnp.zeros(shape, jnp.uint32)
    out = []
    for j in range(L):
        v = t[j] + c
        out.append(v & MASK)
        c = v >> W
    # (t[L] + c) == 0 always since value < 2^256
    return _cond_sub_p(out, shape)


def _cond_sub_p(limbs, shape):
    borrow = jnp.zeros(shape, jnp.uint32)
    d = []
    for j in range(L):
        v = limbs[j] - jnp.uint32(_P[j]) - borrow
        d.append(v & MASK)
        borrow = (v >> W) & jnp.uint32(1)
    take = borrow == 0
    return [jnp.where(take, d[j], limbs[j]) for j in range(L)]


def _add_mod(a, b, shape):
    c = jnp.zeros(shape, jnp.uint32)
    out = []
    for j in range(L):
        v = a[j] + b[j] + c
        out.append(v & MASK)
        c = v >> W
    d = _cond_sub_p(out, shape)
    # carry out of limb 15 is impossible for a, b < p
    return d


# -- elementwise multiply ----------------------------------------------------

def _mul_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[j] for j in range(L)]         # each [SUBS, LANES]
    b = [b_ref[j] for j in range(L)]
    out = _cios(a, b, a[0].shape)
    o_ref[...] = jnp.stack(out, axis=0)


@functools.partial(jax.jit, static_argnames=())
def mont_mul_pallas(a, b):
    """Elementwise Montgomery multiply of stacked limbs uint32[L, *shape];
    broadcasting handled by the caller. Pads the flattened element axis to
    the tile size."""
    shape = a.shape[1:]
    n = int(np.prod(shape)) if shape else 1
    npad = -n % TILE
    af = a.reshape(L, n)
    bf = jnp.broadcast_to(b, a.shape).reshape(L, n)
    if npad:
        af = jnp.concatenate([af, jnp.zeros((L, npad), jnp.uint32)], -1)
        bf = jnp.concatenate([bf, jnp.zeros((L, npad), jnp.uint32)], -1)
    m = (n + npad) // TILE
    af = af.reshape(L, m, SUBS, LANES)
    bf = bf.reshape(L, m, SUBS, LANES)
    out = pl.pallas_call(
        _mul_kernel,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((L, 1, SUBS, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, SUBS, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, 1, SUBS, LANES), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, m, SUBS, LANES), jnp.uint32),
        interpret=_interpret(),
    )(af, bf)
    return out.reshape(L, m * TILE)[:, :n].reshape((L,) + shape)


def _mul_kernel_4d(a_ref, b_ref, o_ref):
    a = [a_ref[j, 0] for j in range(L)]
    b = [b_ref[j, 0] for j in range(L)]
    out = _cios(a, b, a[0].shape)
    o_ref[...] = jnp.stack(out, axis=0)[:, None]


# -- fused packed multiply-add -----------------------------------------------

def _unpack_reg(ref):
    """Packed VMEM rows (PL words) -> L 16-bit limb registers."""
    rows = []
    for wd in range(L // 2):
        v = ref[wd]
        rows.append(v & MASK)
        rows.append(v >> W)
    return rows


def _pack_reg(rows):
    return jnp.stack([rows[2 * j] | (rows[2 * j + 1] << W)
                      for j in range(L // 2)], axis=0)


def _mul_add_kernel(a_ref, b_ref, c_ref, o_ref):
    a = _unpack_reg(a_ref)
    b = _unpack_reg(b_ref)
    c = _unpack_reg(c_ref)
    shape = a[0].shape
    out = _add_mod(_cios(a, b, shape), c, shape)
    o_ref[...] = _pack_reg(out)


@jax.jit
def mul_add_packed(a, b, c):
    """(a*b + c) mod p elementwise on PACKED limbs uint32[PL, B]
    (ops/fused_open.pack_limbs layout), everything in registers — the
    unpack -> mont_mul -> add -> repack chain this replaces cost ~4 extra
    HBM passes in the fused triple pipeline."""
    PLh = L // 2
    B = a.shape[-1]
    tile = SUBS * 512
    bp = -(-B // tile) * tile
    def pad(x):
        x = x.reshape(PLh, B)
        if bp != B:
            x = jnp.concatenate(
                [x, jnp.zeros((PLh, bp - B), jnp.uint32)], axis=-1)
        return x.reshape(PLh, bp // tile, SUBS, 512)
    m = bp // tile
    out = pl.pallas_call(
        _mul_add_kernel,
        grid=(m,),
        in_specs=[pl.BlockSpec((PLh, 1, SUBS, 512), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((PLh, 1, SUBS, 512), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PLh, m, SUBS, 512), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=600 * bp, bytes_accessed=16 * PLh * bp,
            transcendentals=0),
    )(pad(a), pad(b), pad(c))
    return out.reshape(PLh, bp)[:, :B].reshape(a.shape)


def _unpack_reg4(ref):
    """Packed (PLh, 1, 8, 512) block -> L 16-bit limb registers (8, 512)."""
    rows = []
    for wd in range(L // 2):
        v = ref[wd, 0]
        rows.append(v & MASK)
        rows.append(v >> W)
    return rows


def _mul_add4_kernel(a_ref, b_ref, c_ref, o_ref):
    a = _unpack_reg4(a_ref)
    b = _unpack_reg4(b_ref)
    c = _unpack_reg4(c_ref)
    shape = a[0].shape
    out = _add_mod(_cios(a, b, shape), c, shape)
    o_ref[...] = _pack_reg(out)[:, None]


@jax.jit
def mul_add_packed4(a, b, c):
    """mul_add_packed on the extraction kernels' NATIVE 4D layout
    [PL, n, R, S] (R % 8 == 0, S % 512 == 0): the BlockSpec grids over
    the tensor as stored, so none of the operands is reshaped/retiled —
    the flat variant's [PL, n, R, S] -> [PLh, B] reshapes were full
    HBM copies on TPU (tiled layouts), ~0.6 ms each at the triple-bench
    shape."""
    PLh = L // 2
    _, n, R, S = a.shape
    ts = 512 if S % 512 == 0 else 128
    assert R % 8 == 0 and S % ts == 0, (R, S)
    grid = (n, R // 8, S // ts)
    spec = pl.BlockSpec((PLh, 1, 8, ts), lambda j, r, s: (0, j, r, s),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mul_add4_kernel,
        grid=grid,
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((PLh, n, R, S), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=600 * n * R * S, bytes_accessed=16 * PLh * n * R * S,
            transcendentals=0),
    )(a, b, c)


def _sub_mod_reg(a, b, shape):
    """(a - b) mod p on 16-bit limb registers (a, b canonical < p)."""
    borrow = jnp.zeros(shape, jnp.uint32)
    d = []
    for j in range(L):
        v = a[j] - b[j] - borrow
        d.append(v & MASK)
        borrow = (v >> W) & jnp.uint32(1)
    carry = jnp.zeros(shape, jnp.uint32)
    out = []
    for j in range(L):
        v = d[j] + jnp.uint32(P_LIMBS[j]) * borrow + carry
        out.append(v & MASK)
        carry = v >> W
    return out


def _sub_bcast_kernel(a_ref, b_ref, o_ref):
    arows, brows = [], []
    for wd in range(L // 2):
        v = a_ref[wd]                        # (1, SUBS, 512)
        arows += [v & MASK, v >> W]
        u = b_ref[wd, 0]
        brows += [u & MASK, u >> W]
    out = _sub_mod_reg(arows, brows, arows[0].shape)
    o_ref[...] = _pack_reg(out)[:, None]


def _sub_bcast4_kernel(a_ref, b_ref, o_ref):
    arows = []
    for wd in range(L // 2):
        v = a_ref[wd]                        # (8, 512)
        arows += [v & MASK, v >> W]
    brows = _unpack_reg4(b_ref)
    out = _sub_mod_reg(arows, brows, arows[0].shape)
    o_ref[...] = _pack_reg(out)[:, None]


@jax.jit
def sub_bcast_packed4(a, b):
    """(a - b) mod p on PACKED limbs in the native 4D layout: shared
    minuend ``a`` [PL, R, S] (e.g. a single-copy opened value) broadcast
    against per-party ``b`` [PL, n, R, S] via the grid index map ->
    [PL, n, R, S]. Zero reshapes/retiles (see mul_add_packed4)."""
    PLh = L // 2
    _, n, R, S = b.shape
    assert a.shape == (PLh, R, S), (a.shape, b.shape)
    ts = 512 if S % 512 == 0 else 128
    assert R % 8 == 0 and S % ts == 0, (R, S)
    spec = pl.BlockSpec((PLh, 1, 8, ts), lambda j, r, s: (0, j, r, s),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _sub_bcast4_kernel,
        grid=(n, R // 8, S // ts),
        in_specs=[
            pl.BlockSpec((PLh, 8, ts), lambda j, r, s: (0, r, s),
                         memory_space=pltpu.VMEM),
            spec,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((PLh, n, R, S), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=64 * n * R * S, bytes_accessed=8 * PLh * n * R * S,
            transcendentals=0),
    )(a, b)


@jax.jit
def sub_bcast_packed(a, b):
    """(a - b) mod p on PACKED limbs, with ``a`` [PL, B] (one shared
    row, e.g. a single-copy opened value) broadcast against per-party
    ``b`` [PL, n, B] -> [PL, n, B]. The broadcast happens via the grid
    index map, so the replicated minuend never exists in HBM — the
    unpack -> broadcast -> sub_mod -> repack chain this replaces moved
    ~4x the HBM bytes in the packed triple finish."""
    PLh = L // 2
    n, B = b.shape[1], b.shape[2]
    tile = SUBS * 512
    bp = -(-B // tile) * tile

    def pad(x, lead):
        flat = x.reshape(lead + (B,))
        if bp != B:
            flat = jnp.concatenate(
                [flat, jnp.zeros(lead + (bp - B,), jnp.uint32)],
                axis=-1)
        return flat.reshape(lead + (bp // tile, SUBS, 512))

    m = bp // tile
    out = pl.pallas_call(
        _sub_bcast_kernel,
        grid=(n, m),
        in_specs=[
            pl.BlockSpec((PLh, 1, SUBS, 512), lambda j, i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLh, 1, 1, SUBS, 512),
                         lambda j, i: (0, j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PLh, 1, 1, SUBS, 512),
                               lambda j, i: (0, j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PLh, n, m, SUBS, 512), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=64 * n * bp, bytes_accessed=8 * PLh * n * bp,
            transcendentals=0),
    )(pad(a, (PLh,)), pad(b, (PLh, n)))
    return out.reshape(PLh, n, bp)[..., :B]


# -- fused uniform field sampling --------------------------------------------
#
# Threefry-2x32-20 (the same PRF family JAX's default PRNG uses) evaluated
# in-register, feeding the 384-bit draw straight into the 9-round Montgomery
# reduction (ops/montgomery.py::redc384 semantics) — the kernel's only HBM
# traffic is the 64 B/element canonical-limb OUTPUT. The jnp pipeline
# (threefry dispatch + word split + stacked redc) moved ~2.5x that and its
# limb-axis stacks lowered to separate HBM passes; this kernel replaced it
# at ~3x the throughput (the offline programs draw ~64 elements per
# produced triple, so sampling is a first-order cost there).

_TF_ROT_A = (13, 15, 26, 6)
_TF_ROT_B = (17, 29, 16, 24)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32, 20 rounds; c0/c1 uint32 arrays, k0/k1 scalars.
    Bit-exact vs jax._src.prng.threefry_2x32 (tests/test_pallas_field.py)."""
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(0x1BD11BDA))
    x0 = c0 + ks[0]
    x1 = c1 + ks[1]
    for g in range(5):
        rots = _TF_ROT_A if g % 2 == 0 else _TF_ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(g + 1) % 3]
        x1 = x1 + ks[(g + 2) % 3] + jnp.uint32(g + 1)
    return x0, x1


_RR = 9                      # redc rounds: 384 -> < 2p (see mont.redc384)


def _redc384_reg(rows, shape):
    """24 halfword rows (uint32 < 2^16) -> L canonical limb rows; the
    register twin of ops/montgomery.py::redc384."""
    rows = list(rows) + [jnp.zeros(shape, jnp.uint32)]
    for _ in range(_RR):
        m = ((rows[0] & MASK) * jnp.uint32(N0)) & MASK
        for j in range(L):
            mp = m * jnp.uint32(_P[j])
            rows[j] = rows[j] + (mp & MASK)
            rows[j + 1] = rows[j + 1] + (mp >> W)
        carry0 = rows[0] >> W
        rows = rows[1:]
        rows[0] = rows[0] + carry0
    return _normalize(rows[:L + 1], shape)


def _rand_kernel(key_ref, o_ref, *, subs, lanes):
    shape = (subs, lanes)
    k0 = key_ref[0, 0]
    k1 = key_ref[0, 1]
    base = pl.program_id(0).astype(jnp.uint32) * jnp.uint32(subs * lanes)
    e = (base
         + jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(lanes)
         + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    rows = []
    for s in range(6):                       # 6 calls x 64 bits = 384 bits
        w0, w1 = _threefry2x32(k0, k1, jnp.full(shape, jnp.uint32(s)), e)
        for wrd in (w0, w1):
            rows.append(wrd & MASK)
            rows.append(wrd >> W)
    out = _redc384_reg(rows, shape)
    o_ref[...] = jnp.stack(out, axis=0)[:, None]


def rand_limbs_pallas(key_data, numel: int):
    """uint32[2] threefry key -> uint32[L, numel] canonical limbs, each
    element uniform mod p (distance < 2^-129; the represented value is a
    fixed bijection of the 384-bit draw — see FpArray.rand). Counter
    layout: element index e uses threefry counters (s, e), s = 0..5 —
    a distinct-counter scheme like jax.random.bits', not bit-identical
    to it."""
    SUBSR, LANESR = 8, 512
    tile = SUBSR * LANESR
    m = -(-numel // tile)
    kern = functools.partial(_rand_kernel, subs=SUBSR, lanes=LANESR)
    out = pl.pallas_call(
        kern,
        grid=(m,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, 1, SUBSR, LANESR), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, m, SUBSR, LANESR), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=1300 * m * tile, bytes_accessed=4 * L * m * tile,
            transcendentals=0),
    )(key_data.reshape(1, 2))
    return out.reshape(L, m * tile)[:, :numel]


# -- batched modular matmul --------------------------------------------------
#
# Layout: the huge batch axis B rides the 128-lane dimension and the (small)
# output axis n rides sublanes, so every CIOS register op is a full [n, 128]
# vector tile — no lane padding for the typical n = 64 party count (the
# first kernel generation put n on lanes and wasted half the VPU).

def _matmul_kernel(a_ref, v_ref, o_ref, *, kt, tn):
    """One (B-tile, n-tile, k-tile) grid step:
    a_ref [L, KT, TBL]; v_ref [L, KT, TN]; o_ref [L, TN, TBL].
    The k grid dimension is minormost, so o_ref persists across the KT
    steps and accumulates modularly (the standard reduction pattern);
    step 0 initializes it."""
    TBL = a_ref.shape[2]
    shape = (tn, TBL)
    kk_idx = pl.program_id(2)
    acc = None
    for kk in range(kt):
        a_col = [a_ref[j, kk, :][None, :] for j in range(L)]   # [1, TBL]
        v_row = [v_ref[j, kk, :][:, None] for j in range(L)]   # [TN, 1]
        prod = _cios([jnp.broadcast_to(x, shape) for x in a_col],
                     [jnp.broadcast_to(x, shape) for x in v_row], shape)
        acc = prod if acc is None else _add_mod(acc, prod, shape)

    @pl.when(kk_idx == 0)
    def _():
        o_ref[...] = jnp.stack(acc, axis=0)

    @pl.when(kk_idx != 0)
    def _():
        prev = [o_ref[j] for j in range(L)]
        o_ref[...] = jnp.stack(_add_mod(prev, acc, shape), axis=0)


def fp_matmul_pallas(a, v):
    """a[L, B, k] @ v[L, k, n] -> [L, B, n] over GF(p), Montgomery form.
    3-D grid: B rides the lanes (TBL), the output axis n rides sublanes
    (TN), and the contraction is tiled (KT) with in-place modular
    accumulation — bounded VMEM for any (B, k, n)."""
    Lx, B, k = a.shape
    n = v.shape[2]
    TBL = 128
    KT = min(k, 16)
    TN = min(n, 128)
    bpad = -B % TBL
    kpad = -k % KT
    npad = -n % TN
    at = jnp.swapaxes(a, 1, 2)                       # [L, k, B]
    if bpad:
        at = jnp.concatenate([at, jnp.zeros((L, k, bpad), jnp.uint32)], 2)
    if kpad:
        at = jnp.concatenate(
            [at, jnp.zeros((L, kpad, B + bpad), jnp.uint32)], 1)
        v = jnp.concatenate([v, jnp.zeros((L, kpad, n), jnp.uint32)], 1)
    if npad:
        v = jnp.concatenate(
            [v, jnp.zeros((L, k + kpad, npad), jnp.uint32)], 2)
    nb = (B + bpad) // TBL
    nn = (n + npad) // TN
    nk = (k + kpad) // KT
    kern = functools.partial(_matmul_kernel, kt=KT, tn=TN)
    out = pl.pallas_call(
        kern,
        grid=(nb, nn, nk),
        in_specs=[
            pl.BlockSpec((L, KT, TBL), lambda i, j, kk: (0, kk, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, KT, TN), lambda i, j, kk: (0, kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, TN, TBL), lambda i, j, kk: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n + npad, B + bpad), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * (B + bpad) * (k + kpad) * (n + npad) * L * L,
            bytes_accessed=4 * L * ((B + bpad) * (k + n) + k * n),
            transcendentals=0),
    )(at, v)
    return jnp.swapaxes(out[:, :n, :B], 1, 2)
