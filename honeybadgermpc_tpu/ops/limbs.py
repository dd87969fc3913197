"""Limb decomposition constants and host-side conversions for GF(p) on TPU.

The BLS12-381 scalar field prime (reference: honeybadgermpc/elliptic_curve.py:4-5)
is a 255-bit prime. TPUs have no native wide-integer arithmetic, so field
elements are decomposed into 16 limbs of 16 bits each, stored in uint32 lanes
(values always < 2**16 between kernel steps). All device-side arithmetic is
Montgomery-form (R = 2**256) so that modular multiplication is a carry-save
CIOS loop of 16x16->32-bit products that never overflows uint32:
    a*b + c + d <= (2^16-1)^2 + 2*(2^16-1) = 2^32 - 1.

Layout convention: limbs are the LEADING axis — ``uint32[L, *shape]`` — so the
element axes stay minor and map onto the TPU's 8x128 vector lanes; the limb
axis is unrolled in kernels (it is a Python list of L arrays inside the hot
loops, never dynamically indexed).
"""

from __future__ import annotations

import numpy as np

# BLS12-381 scalar field modulus (reference: elliptic_curve.py:4-5).
P = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

W = 16                    # bits per limb
L = 16                    # number of limbs (256 bits total)
MASK = (1 << W) - 1
R = 1 << (W * L)          # Montgomery radix 2**256
R_MOD_P = R % P
R2_MOD_P = (R * R) % P
R3_MOD_P = (R * R * R) % P
N0 = (-pow(P, -1, 1 << W)) % (1 << W)   # -p^{-1} mod 2**16, the CIOS m-factor

# Multiplicative generator / 2-adicity facts for NTT root-of-unity work.
TWO_ADICITY = 32                         # p - 1 = 2**32 * odd
assert (P - 1) % (1 << TWO_ADICITY) == 0
assert (P - 1) % (1 << (TWO_ADICITY + 1)) != 0


def int_to_limbs(x: int) -> np.ndarray:
    """Python int (< 2**256) -> uint32[L] little-endian 16-bit limbs."""
    return np.array([(x >> (W * i)) & MASK for i in range(L)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    """uint32[L] -> Python int."""
    return sum(int(limbs[i]) << (W * i) for i in range(L))


def ints_to_limbs(xs, dtype=np.uint32) -> np.ndarray:
    """Iterable/array of Python ints -> uint32[L, *shape] limb array.

    Accepts nested lists or numpy object arrays; the output's trailing shape
    matches the input's shape.
    """
    arr = np.asarray(xs, dtype=object)
    flat = arr.reshape(-1)
    out = np.empty((L, flat.shape[0]), dtype=dtype)
    for j, v in enumerate(flat):
        v = int(v)
        for i in range(L):
            out[i, j] = (v >> (W * i)) & MASK
    return out.reshape((L,) + arr.shape)


def limbs_to_ints(limbs) -> np.ndarray:
    """uint32[L, *shape] -> object array of Python ints with shape *shape."""
    limbs = np.asarray(limbs)
    shape = limbs.shape[1:]
    flat = limbs.reshape(L, -1)
    out = np.empty(flat.shape[1], dtype=object)
    for j in range(flat.shape[1]):
        out[j] = sum(int(flat[i, j]) << (W * i) for i in range(L))
    return out.reshape(shape)


P_LIMBS = int_to_limbs(P)
R_MOD_P_LIMBS = int_to_limbs(R_MOD_P)     # Montgomery form of 1
R2_MOD_P_LIMBS = int_to_limbs(R2_MOD_P)
ONE_LIMBS = int_to_limbs(1)               # plain 1 (used to exit Montgomery form)
ZERO_LIMBS = int_to_limbs(0)
