"""Generic folded-band MXU matmul against a HOST-CONSTANT int matrix.

out[..., m] = sum_k a[..., k] * mat[k][m]  over GF(p), a and out in
Montgomery form, mat in plain ints (the host fold pre-multiplies by
2^(16*rounds) so the REDC epilogue lands back in Montgomery form — same
scheme as ops/fused_open.py, reference kernels hbmpc_ntl_helpers.pyx:199
vandermonde_batch_evaluate / :139 vandermonde_batch_interpolate).

This is the engine behind Vandermonde batch evaluate/interpolate for
protocol-constant point sets (share dealing, hyperinvertible extraction);
`ops/mxu_matmul.py` keeps the device-matrix variant for runtime operands.

Layout: the batch axis is the MXU lane axis. Input [L, B, k] is packed
(2x16-bit limbs/word) and tiled to [nblk, PL, k, TBW] so every grid step
streams one contiguous HBM block, dots [NBAL*mp, kcols] @ [kcols, TBW] and
folds in-VMEM (ops/fused_open.py kernel recipe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_open import (KMAX, NBAL, PL, TB, _bal_bias, _bal_fold_init,
                         _band_dot_fold, _folded_band_host, _pad_band,
                         _planes_of_packed, _pack16, _round8, pack_limbs,
                         unpack_limbs)
from .limbs import L, P
from .mxu_matmul import _interpret

_VMEM_BUDGET = 13 * 2 ** 20


def _pick_tbw(k: int, mp: int, kcols: int) -> int:
    """Largest lane width (multiple of TB, <= 512) whose kernel working
    set fits VMEM: dot intermediate + fold temps + double-buffered io +
    band."""
    band = NBAL * mp * kcols
    for tbw in (512, 384, 256, 128):
        need = (4 * NBAL * mp * tbw        # d32
                + 21 * 4 * mp * tbw        # fold accumulators
                + 2 * 4 * PL * k * tbw     # in blocks (double-buffered)
                + 2 * 4 * PL * mp * tbw    # out blocks
                + band + NBAL * k * tbw)   # band + planes
        if need <= _VMEM_BUDGET:
            return tbw
    return TB


def band_fits(k: int, m: int) -> bool:
    return k <= KMAX and m <= 128


@functools.lru_cache(maxsize=None)
def _band_call(mat_key: tuple, k: int, m: int, bpad: int):
    """mat_key: tuple-of-tuples plain-int matrix [k][m] (hashable)."""
    mp = _round8(m)
    kcols = k * NBAL
    band = _pad_band(_folded_band_host(
        [list(r) for r in mat_key], 2, mp), kcols)
    init = _bal_fold_init(k)
    bias = _bal_bias(k)
    tbw = _pick_tbw(k, mp, kcols)
    nblk = bpad // tbw

    def kernel(a_ref, w_ref, o_ref):
        planes = _planes_of_packed(lambda w: a_ref[0, w], k, kcols)
        out = _band_dot_fold(w_ref[0], planes, mp, init, bias)
        o_ref[0] = _pack16(out)

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, PL, k, tbw), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBAL * mp, kcols), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PL, mp, tbw), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, PL, mp, tbw), jnp.uint32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bpad * kcols * NBAL * mp,
            bytes_accessed=4 * PL * bpad * (k + mp),
            transcendentals=0),
    )
    # band stays host numpy: this builder is lru-cached across jit traces
    w = np.ascontiguousarray(band)
    return call, w, tbw, mp


def band_matmul_limbs(a_limbs, mat_key: tuple):
    """a[L, B, k] (Montgomery limbs) x plain-int mat[k][m] -> [L, B, m]."""
    _, B, k = a_limbs.shape
    m = len(mat_key[0])
    tbw_probe = _pick_tbw(k, _round8(m), k * NBAL)
    bpad = -(-B // tbw_probe) * tbw_probe
    call, w, tbw, mp = _band_call(mat_key, k, m, bpad)
    packed = pack_limbs(a_limbs)                   # [PL, B, k]
    if bpad != B:
        packed = jnp.concatenate(
            [packed, jnp.zeros((PL, bpad - B, k), jnp.uint32)], axis=1)
    # ONE transpose pass each way (a swapaxes + reshape + transpose chain
    # here lowered to multiple full-tensor copy passes, ~60% of the band
    # path's wall time at the offline-program shapes)
    tiled = packed.reshape(PL, bpad // tbw, tbw, k).transpose(1, 0, 3, 2)
    out = call(tiled, w)                           # [nblk, PL, mp, tbw]
    flat = out.transpose(1, 0, 3, 2).reshape(PL, bpad, mp)
    return unpack_limbs(flat[:, :B, :m])
