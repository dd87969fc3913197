"""Power-sum mixing (reference apps/asynchromix/powermixing.py:12-206 with
the native kernels apps/asynchromix/cpp/compute-power-sums.cpp:17-53 and
solver/solver.cpp).

Three phases:
 1. per message m with a powers-tuple ([b], [b^2], .., [b^k]): open
    e = m - b, then compute [m^j] = sum_l C(j,l) e^(j-l) [b^l] — the C++
    DP diagonal recurrence becomes a batched public-coefficient linear
    combination on device.
 2. sum the power shares over all messages and batch-open the k power sums.
 3. Newton's identities -> elementary symmetric polynomial coefficients ->
    root-finding over GF(p) recovers the (unordered) message set. The
    reference shells out to a FLINT solver; here phase-3 is a host
    Cantor-Zassenhaus (control-plane sized: one poly per epoch).
"""

from __future__ import annotations

import random
from math import comb

import jax.numpy as jnp

from ..ops.fparray import FpArray
from ..ops.limbs import P
from ..runtime.context import MpcContext, ShareArray


def compute_power_shares(ctx: MpcContext, messages: ShareArray,
                         b_powers: ShareArray) -> ShareArray:
    """messages [.., B]; b_powers [.., B, k] (shares of b, b^2, .., b^k) ->
    [m^1..m^k] shares [.., B, k] at the cost of ONE batched open.

    [m^j] = e^j + sum_{l=1..j} C(j,l) e^(j-l) [b^l],  e = m - b (public).
    """
    k = b_powers.v.shape[-1]
    b1 = ctx.ShareArray(FpArray(b_powers.v.limbs[..., 0]), b_powers.t)
    e = ctx.open_share_array(messages - b1)            # public [.., B]

    # public coefficient tensors: e^d for d = 0..k
    e_pows = [FpArray.from_int(1).broadcast_to(e.shape), e]
    for _ in range(2, k + 1):
        e_pows.append(e_pows[-1] * e)

    out = []
    for j in range(1, k + 1):
        acc = e_pows[j]                                # e^j  (l = 0 term)
        for l in range(1, j + 1):
            c = FpArray.from_int(comb(j, l))
            term = (e_pows[j - l] * c) * FpArray(b_powers.v.limbs[..., l - 1])
            acc = acc + term
        out.append(acc)
    limbs = jnp.stack([o.limbs for o in out], axis=-1)  # [L, .., B, k]
    return ctx.ShareArray(FpArray(limbs), messages.t)


def power_sums(ctx: MpcContext, m_powers: ShareArray) -> FpArray:
    """Sum over the message axis and open the k power sums
    (powermixing.py:74-95)."""
    v = m_powers.v                                      # [.., B, k]
    summed = _sum_axis(v, axis=v.ndim - 2)
    return ctx.open_share_array(ctx.ShareArray(summed, m_powers.t))


def newton_inversion(psums: list, k: int) -> list:
    """Power sums p_1..p_k -> elementary symmetric e_1..e_k via Newton's
    identities (host ints; solver.cpp front half)."""
    e = [1]
    for j in range(1, k + 1):
        acc = 0
        sign = 1
        for i in range(1, j + 1):
            acc = (acc + sign * e[j - i] * psums[i - 1]) % P
            sign = -sign
        e.append(acc * pow(j, P - 2, P) % P)
    return e[1:]


def find_roots(elem_sym: list) -> list:
    """Roots of x^k - e1 x^(k-1) + e2 x^(k-2) - ... over GF(p) via
    Cantor-Zassenhaus (native C++ `find_roots`, the role of the reference's
    FLINT solver.cpp; pure-Python fallback below). Assumes distinct roots
    (messages are randomized field elements)."""
    k = len(elem_sym)
    poly = [1]
    for j, ej in enumerate(elem_sym):
        poly.append((-1) ** (j + 1) * ej % P)
    # poly coeffs descending: x^k - e1 x^{k-1} + ...
    f = list(reversed(poly))     # ascending

    try:
        from ..native import _hbmpc_native as _nat
    except Exception:
        _nat = None
    if _nat is not None and hasattr(_nat, "find_roots"):
        buf = b"".join(c.to_bytes(32, "little") for c in f)
        out = _nat.find_roots(buf)
        roots = sorted(int.from_bytes(out[i * 32:(i + 1) * 32], "little")
                       for i in range(len(out) // 32))
        assert len(roots) == k, f"expected {k} distinct roots, got {len(roots)}"
        return roots

    def pmod(a, m):
        a = a[:]
        dm = len(m) - 1
        inv = pow(m[-1], P - 2, P)
        while len(a) - 1 >= dm and any(a):
            da = len(a) - 1
            if a[-1] == 0:
                a.pop()
                continue
            c = a[-1] * inv % P
            off = da - dm
            for i in range(dm + 1):
                a[off + i] = (a[off + i] - c * m[i]) % P
            a.pop()
        return a if a else [0]

    def pmulmod(a, b, m):
        out = [0] * (len(a) + len(b) - 1)
        for i, x in enumerate(a):
            if x:
                for j, y in enumerate(b):
                    out[i + j] = (out[i + j] + x * y) % P
        return pmod(out, m)

    def ppowmod(base, e, m):
        result = [1]
        while e:
            if e & 1:
                result = pmulmod(result, base, m)
            base = pmulmod(base, base, m)
            e >>= 1
        return result

    def pgcd(a, b):
        a, b = a[:], b[:]
        while any(b):
            a = pmod(a, b)
            a, b = b, a
        lead_inv = pow(a[-1], P - 2, P)
        return [c * lead_inv % P for c in a]

    rng = random.Random(0xC0FFEE)

    def split(g):
        """Recursively split a product of distinct linear factors."""
        d = len(g) - 1
        if d == 0:
            return []
        if d == 1:
            return [(-g[0]) * pow(g[1], P - 2, P) % P]
        while True:
            r = rng.randrange(P)
            h = ppowmod([r, 1], (P - 1) // 2, g)   # (x + r)^((p-1)/2) mod g
            h = h[:]
            h[0] = (h[0] - 1) % P
            d1 = pgcd(g, h)
            if 0 < len(d1) - 1 < d:
                d2 = _pdiv(g, d1)
                return split(d1) + split(d2)

    def _pdiv(num, den):
        num = num[:]
        out = [0] * (len(num) - len(den) + 1)
        inv = pow(den[-1], P - 2, P)
        while len(num) >= len(den):
            c = num[-1] * inv % P
            off = len(num) - len(den)
            out[off] = c
            for i in range(len(den)):
                num[off + i] = (num[off + i] - c * den[i]) % P
            num.pop()
        return out

    # restrict to the split part: gcd(f, x^p - x) = product of linear factors
    xp = ppowmod([0, 1], P, f)
    xp_minus_x = xp[:]
    if len(xp_minus_x) < 2:
        xp_minus_x += [0] * (2 - len(xp_minus_x))
    xp_minus_x[1] = (xp_minus_x[1] - 1) % P
    g = pgcd(f, xp_minus_x)
    roots = split(g)
    assert len(roots) == k, f"expected {k} distinct roots, got {len(roots)}"
    return sorted(roots)


async def async_mixing(ctx: MpcContext, messages: ShareArray,
                       b_powers: ShareArray) -> list:
    """End-to-end power-mix: returns the sorted plaintext message set."""
    return power_mix(ctx, messages, b_powers)


def power_mix(ctx: MpcContext, messages: ShareArray,
              b_powers: ShareArray) -> list:
    k = messages.v.shape[-1]
    assert b_powers.v.shape[-1] >= k
    bp = ctx.ShareArray(FpArray(b_powers.v.limbs[..., :k]), b_powers.t)
    mp = compute_power_shares(ctx, messages, bp)
    sums = power_sums(ctx, mp)
    psums = [int(v) for v in sums.to_ints()[0] if True] \
        if ctx.sim else [int(v) for v in sums.to_ints()]
    elem = newton_inversion(psums, k)
    return find_roots(elem)


def _sum_axis(v: FpArray, axis: int) -> FpArray:
    """Tree-sum a FpArray along an element axis."""
    limbs = jnp.moveaxis(v.limbs, axis + 1, -1)
    cur = FpArray(limbs)
    from ..runtime.comparison import _sum_last
    return _sum_last(cur)
