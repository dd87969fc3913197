"""Reed-Solomon encode/decode over GF(p) on the TPU.

Strategy-pattern layer mirroring the reference's reed_solomon.py (ABCs
:21-85, VandermondeEncoder/Decoder :88/:119, FFTEncoder/Decoder :101/:134)
re-designed for batched synchronous execution:

* An ``Encoding`` wraps an EvalPoint-style domain (Vandermonde points i+1 or
  FFT points omega^i) and exposes batched encode/decode kernels.
* "Arrival order" is replaced by an erasure SUBSET: decode takes the list of
  party indices whose shares are present (trace-time constant, cached per
  subset exactly as the reference caches per x-set / fnt_decode_step1 —
  rsdecode_impl.h:18-20, 194-224).
* The FNT decode path implements fnt_decode_step1/step2
  (rsdecode_impl.h:194-265): step1 is host-exact per subset, step2 is the
  batched O(n log n) device kernel.

Robust (error-correcting) decode lives in ops/gao.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..polynomial import get_omega_int
from . import montgomery as mont
from .fparray import FpArray
from .limbs import L, P, R_MOD_P, ints_to_limbs
from .fpmatmul import (fp_matmul, lagrange_matrix, vandermonde_batch_evaluate,
                       vandermonde_batch_interpolate, vandermonde_matrix)
from .ntt import fft_evaluate, fft_interpolate, intt, ntt


def next_pow2(n: int) -> int:
    return n if n & (n - 1) == 0 else 1 << n.bit_length()


class Encoding:
    """Evaluation domain for n parties; use_omega_powers selects the FFT
    domain (party i ↦ omega^i, order = next pow2 >= n) vs Vandermonde
    (party i ↦ i+1). Mirrors reference EvalPoint / EncoderSelector roles."""

    def __init__(self, n: int, use_omega_powers: bool = False):
        self.n = n
        self.use_omega_powers = use_omega_powers
        if use_omega_powers:
            self.order = next_pow2(n)
            self.omega2 = get_omega_int(P, 2 * self.order, seed=0)
            self.omega = self.omega2 * self.omega2 % P
            self.points = [pow(self.omega, i, P) for i in range(n)]
        else:
            self.order = n
            self.omega2 = None
            self.omega = None
            self.points = list(range(1, n + 1))

    # -- encode ------------------------------------------------------------
    # All device work below runs inside shape-keyed jitted kernels; zs/x-set
    # dependent tables are host-cached and passed as device ARGUMENTS, so a
    # new erasure subset never triggers a fresh multi-second compile (the
    # arrival-order decoding path generates many subsets). decode() forces
    # allow_band=False for the same reason: the big-batch band kernel is
    # x-set-keyed by design and is reserved for the ONE production x-set
    # (encode at the n party points).
    def encode(self, coeffs: FpArray) -> FpArray:
        """coeffs[..., k] -> shares[..., n] (share j = poly(point_j))."""
        k = coeffs.shape[-1]
        assert k <= self.n
        if self.use_omega_powers:
            return fft_evaluate(coeffs, self.omega, self.order, k=self.n)
        return vandermonde_batch_evaluate(self.points, coeffs)

    # -- erasure decode ----------------------------------------------------
    def decode(self, zs, ys: FpArray) -> FpArray:
        """Interpolate coefficients from shares of parties ``zs`` (tuple of
        party indices); ys[..., len(zs)]."""
        zs = tuple(int(z) for z in zs)
        assert ys.shape[-1] == len(zs)
        if self.use_omega_powers:
            return self._fnt_decode(zs, ys)
        xs = tuple(self.points[z] for z in zs)
        return vandermonde_batch_interpolate(xs, ys, allow_band=False)

    def interpolate_at(self, zs, ys: FpArray, x0: int = 0) -> FpArray:
        from .fpmatmul import lagrange_evaluate_at
        xs = [self.points[z] for z in zs]
        return lagrange_evaluate_at(xs, ys, x0)   # jitted inside

    # -- FNT decode (rsdecode_impl.h:194-265) ------------------------------
    def _fnt_decode(self, zs: tuple, ys: FpArray) -> FpArray:
        n, omega, omega2 = self.order, self.omega, self.omega2
        a_evals, ai_inv, _ = _fnt_step1(n, omega2, zs)
        from .devcache import dev_const
        return _fnt_decode_kernel(omega, omega2, n, ys,
                                  FpArray(dev_const(ai_inv)),
                                  FpArray(dev_const(_scatter_matrix(n, zs))),
                                  FpArray(dev_const(a_evals)))


@partial(jax.jit, static_argnums=(0, 1, 2))
def _fnt_decode_kernel(omega: int, omega2: int, n: int, ys: FpArray,
                       ai_inv: FpArray, scatter: FpArray,
                       a_evals: FpArray) -> FpArray:
    """fnt_decode_step2 (rsdecode_impl.h:226-265): one compiled program per
    (omega, n, shape); the zs-dependent step1 tables arrive as arguments."""
    k = ys.shape[-1]
    # N'(X): coefficient z_i is y_i / Ai(x_i); others 0.
    nis = ys * ai_inv                                  # [..., k]
    ncoeffs = fp_matmul(nis, scatter)                  # scatter [k, n] 0/1
    nevals = ntt(ncoeffs, omega)                       # N'(omega^i)
    # P/A(X) = -reverse(nevals) as coefficients, evaluated on 2n domain
    rev = FpArray(nevals.limbs[..., ::-1])
    power_a = -rev
    pas = fft_evaluate(power_a, omega2, 2 * n)
    ps = pas * a_evals                                 # [..., 2n]
    prec = intt(ps, omega2)
    return FpArray(prec.limbs[..., :k])


@lru_cache(maxsize=None)
def _fnt_step1(n: int, omega2: int, zs: tuple):
    """Host-exact fnt_decode_step1 (rsdecode_impl.h:194-224): A(X) evals on
    the 2n omega2-domain and 1/Ai(x_i) per kept party, as Montgomery limbs.
    Cached per (n, zs) — the reference's per-x-set amortization."""
    omega = omega2 * omega2 % P
    xs = [pow(omega, z, P) for z in zs]
    # A(X) = prod (X - x_i)
    a = [1]
    for x in xs:
        nxt = [0] * (len(a) + 1)
        for i, c in enumerate(a):
            nxt[i] = (nxt[i] - c * x) % P
            nxt[i + 1] = (nxt[i + 1] + c) % P
        a = nxt
    a_evals = []
    w = 1
    for i in range(2 * n):
        acc = 0
        xp = 1
        for c in a:
            acc = (acc + c * xp) % P
            xp = xp * w % P
        a_evals.append(acc)
        w = w * omega2 % P
    ai_inv = []
    for i, xi in enumerate(xs):
        ai = 1
        for j, xj in enumerate(xs):
            if i != j:
                ai = ai * (xi - xj) % P
        ai_inv.append(pow(ai, P - 2, P))
    to_l = lambda vals: ints_to_limbs(
        np.asarray([v * R_MOD_P % P for v in vals], dtype=object))
    return to_l(a_evals), to_l(ai_inv), tuple(xs)


@lru_cache(maxsize=None)
def _scatter_matrix(n: int, zs: tuple):
    """0/1 matrix [k, n] placing value i at column zs[i] (Montgomery form)."""
    m = np.zeros((len(zs), n), dtype=object)
    for i, z in enumerate(zs):
        m[i, z] = 1
    return ints_to_limbs(np.vectorize(lambda v: v * R_MOD_P % P, otypes=[object])(m))


class EncoderSelector:
    """Evaluation-domain heuristic (reference reed_solomon.py:406-459):
    tiny n -> Vandermonde matmul; large n -> FFT domain; in between,
    power-of-two proximity decides (the reference also weighs batch size
    against cores — on TPU the batch axis is free, so proximity rules)."""

    @staticmethod
    def select(n: int, batch_size: int = 1) -> bool:
        """Returns use_omega_powers."""
        if n < 8:
            return False
        if n >= 128:
            return True
        order = next_pow2(n)
        # close to a power of two -> little padding waste -> FFT
        return (order - n) <= n // 4

    @staticmethod
    def get(n: int, batch_size: int = 1) -> "Encoding":
        return Encoding(n, EncoderSelector.select(n, batch_size))


DecoderSelector = EncoderSelector  # same heuristic both directions


def optimistic_check(enc: Encoding, coeffs: FpArray, zs_check, ys_check: FpArray):
    """Re-encode decoded coefficients and compare against additional shares
    (the reference IncrementalDecoder's optimistic validation,
    reed_solomon.py:305-332). Returns bool mask [..., len(zs_check)] of
    AGREEMENT per share."""
    shares = enc.encode(coeffs)
    sub = shares.take(list(zs_check), axis=shares.ndim - 1)
    return sub.eq(ys_check)
