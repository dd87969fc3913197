"""Byte-level erasure coding over GF(p) for the broadcast layer.

The reference uses zfec (GF(256) RS) for RBC/AVID striping
(broadcast/reliablebroadcast.py:19-67). Here the same (k, n) striping is
built on the framework's own field: the message is packed into 31-byte
GF(p) elements, each group of k elements becomes polynomial coefficients,
and stripe j holds the evaluations at point j+1. Any k stripes
reconstruct. Control-plane sizes are small, so this runs host-side with
exact ints (device kernels would pay a compile per message size).
"""

from __future__ import annotations

from functools import lru_cache

from ..ops.limbs import P

ELEM_BYTES = 31  # 248 bits < 255-bit p, so packing never overflows


def _pack(data: bytes, k: int):
    """bytes -> list of field elements, length padded to a multiple of k.
    A 4-byte big-endian length header makes unpadding exact."""
    framed = len(data).to_bytes(4, "big") + data
    nelem = -(-len(framed) // ELEM_BYTES)
    nelem += -nelem % k
    framed = framed.ljust(nelem * ELEM_BYTES, b"\0")
    return [int.from_bytes(framed[i * ELEM_BYTES:(i + 1) * ELEM_BYTES], "big")
            for i in range(nelem)]


def _unpack(elems) -> bytes:
    raw = b"".join(int(e).to_bytes(ELEM_BYTES, "big") for e in elems)
    ln = int.from_bytes(raw[:4], "big")
    return raw[4:4 + ln]


@lru_cache(maxsize=None)
def _lagrange_rows(zs: tuple, n_points: int):
    """Interpolation weights: coeffs of value at each x for subset zs."""
    xs = [z + 1 for z in zs]
    rows = []
    for x0 in range(1, n_points + 1):
        row = []
        for j, xj in enumerate(xs):
            num, den = 1, 1
            for m, xm in enumerate(xs):
                if m != j:
                    num = num * (x0 - xm) % P
                    den = den * (xj - xm) % P
            row.append(num * pow(den, P - 2, P) % P)
        rows.append(row)
    return rows


def encode(k: int, n: int, data: bytes):
    """-> n stripes (lists of ints); any k reconstruct. Stripe j holds
    group-poly evaluations at x = j+1. Large payloads use the native C++
    kernel (native/hbmpc_native.cpp rs_encode)."""
    elems = _pack(data, k)
    nat = _native()
    if nat is not None and len(elems) >= 4 * k:
        from ..native import bytes_to_ints, ints_to_bytes
        flat = bytes_to_ints(nat.rs_encode(k, n, ints_to_bytes(elems)))
        ngroups = len(elems) // k
        return [flat[j * ngroups:(j + 1) * ngroups] for j in range(n)]
    groups = [elems[i:i + k] for i in range(0, len(elems), k)]
    stripes = [[] for _ in range(n)]
    for g in groups:
        for j in range(n):
            x = j + 1
            acc = 0
            for c in reversed(g):
                acc = (acc * x + c) % P
            stripes[j].append(acc)
    return stripes


def _native():
    try:
        from ..native import get_native
        return get_native()
    except Exception:
        return None


def decode(k: int, n: int, stripes) -> bytes:
    """stripes: list of length n with None for missing; needs >= k present."""
    zs = tuple(j for j, s in enumerate(stripes) if s is not None)[:k]
    assert len(zs) == k, "not enough stripes"
    nat = _native()
    ngroups0 = len(stripes[zs[0]])
    if nat is not None and ngroups0 * k >= 4 * k:
        from ..native import bytes_to_ints, ints_to_bytes
        ys = [int(stripes[z][g]) for z in zs for g in range(ngroups0)]
        flat = bytes_to_ints(nat.lagrange_interpolate(
            ints_to_bytes([z + 1 for z in zs]), ints_to_bytes(ys), k))
        return _unpack(flat)
    # interpolate coefficients per group via Lagrange at the k points
    xs = [z + 1 for z in zs]
    ngroups = len(stripes[zs[0]])
    # coefficient extraction: build Lagrange basis polynomials once
    basis = _basis_polys(tuple(xs))
    elems = []
    for gi in range(ngroups):
        coeffs = [0] * k
        for j, z in enumerate(zs):
            y = stripes[z][gi] % P
            bj = basis[j]
            for d in range(k):
                coeffs[d] = (coeffs[d] + y * bj[d]) % P
        elems.extend(coeffs)
    return _unpack(elems)


@lru_cache(maxsize=None)
def _basis_polys(xs: tuple):
    """Lagrange basis polynomial coefficients for the given points."""
    k = len(xs)
    # master poly A(X) = prod (X - x)
    a = [1]
    for x in xs:
        nxt = [0] * (len(a) + 1)
        for i, c in enumerate(a):
            nxt[i] = (nxt[i] - c * x) % P
            nxt[i + 1] = (nxt[i + 1] + c) % P
        a = nxt
    out = []
    for j, xj in enumerate(xs):
        nj = [0] * k
        carry = a[k]
        for i in range(k - 1, -1, -1):
            nj[i] = carry
            carry = (a[i] + carry * xj) % P
        den = 1
        for m, xm in enumerate(xs):
            if m != j:
                den = den * (xj - xm) % P
        dinv = pow(den, P - 2, P)
        out.append([c * dinv % P for c in nj])
    return out


def serialize_stripe(stripe) -> bytes:
    return b"".join(int(v).to_bytes(32, "big") for v in stripe)


def deserialize_stripe(raw: bytes):
    return [int.from_bytes(raw[i:i + 32], "big") for i in range(0, len(raw), 32)]
