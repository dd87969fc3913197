"""Split the headline batch-open bench time across its component matmuls.

Usage: python scripts/profile_open.py   (runs on the default backend / TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.rs import Encoding
from honeybadgermpc_tpu.ops.fpmatmul import decode_validate_matmul
from honeybadgermpc_tpu.parallel.mesh import SimBackend
from honeybadgermpc_tpu.parallel.reconstruct import (_decode_block,
                                                     _sim_reconstruct_jit)
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements


def _force(out):
    # device_get forces a real round trip: on the remote axon backend,
    # block_until_ready can return once the work is enqueued.
    return jax.device_get(jax.tree_util.tree_map(
        lambda x: x.ravel()[:1] if hasattr(x, "ravel") else x, out))


def timeit(name, fn, *args, iters=5):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    n, t = 64, 21
    k = t + 1
    SEG = 16368
    C = SEG // k                      # chunks per party

    pre = PreProcessedElements(n, t, seed=0)
    pre.generate_rands(SEG)
    shares = pre.get_rands(SEG)       # [n, SEG]
    enc = Encoding(n)

    coeffs = shares.reshape((n, C, k))

    encode_j = jax.jit(lambda x: enc.encode(FpArray(x)).limbs)
    cols = FpArray(encode_j(coeffs.limbs))
    recv = SimBackend(n).all_to_all(cols)

    dec1_j = jax.jit(lambda x: _decode_block(
        enc, FpArray(x), k, True, want_coeffs=False)[0].limbs)
    vals = FpArray(dec1_j(recv.limbs))
    gathered = SimBackend(n).all_gather(vals)

    dec2_j = jax.jit(lambda x: _decode_block(
        enc, FpArray(x), k, True, want_coeffs=True)[0].limbs)

    # non-robust variants (matmul only, no validation compare)
    dec1nr_j = jax.jit(lambda x: _decode_block(
        enc, FpArray(x), k, False, want_coeffs=False)[0].limbs)
    dec2nr_j = jax.jit(lambda x: _decode_block(
        enc, FpArray(x), k, False, want_coeffs=True)[0].limbs)

    full = _sim_reconstruct_jit(n, t, False, True)

    print(f"backend={jax.default_backend()}  n={n} t={t} SEG={SEG} C={C}")
    d_full = timeit("full open (1 seg)", lambda x: full(x)[0], shares.limbs)
    d_enc = timeit("encode", encode_j, coeffs.limbs)
    d_d1 = timeit("R1 decode (robust)", dec1_j, recv.limbs)
    d_d1n = timeit("R1 decode (matmul only)", dec1nr_j, recv.limbs)
    d_d2 = timeit("R2 decode (robust)", dec2_j, gathered.limbs)
    d_d2n = timeit("R2 decode (matmul only)", dec2nr_j, gathered.limbs)
    print(f"{'sum of parts':32s} {(d_enc + d_d1 + d_d2) * 1e3:9.2f} ms")
    print(f"rate (1 seg): {SEG / d_full:,.0f} shares/s")


if __name__ == "__main__":
    main()
