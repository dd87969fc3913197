"""ctypes bindings for the native BLS12-381 core (native/bls12_381.cpp).

Drop-in accelerators for the pure-Python tower in crypto/pairing.py (the
reference's Rust pypairing role, pairing/src/lib.rs). All values cross the
ABI in plain little-endian bytes; conversion helpers map to/from the
pairing.py CurvePoint/Fq12 objects so either backend can serve any call.

Build: python native/build.py (also attempted lazily on first import).
``LIB`` is None when the shared library is unavailable — callers fall back
to pure Python.
"""

from __future__ import annotations

import ctypes
import os

from . import pairing as pp

_SO = os.path.join(os.path.dirname(__file__), "..", "native",
                   "libbls12_381.so")


def _load():
    path = os.path.abspath(_SO)
    if not os.path.exists(path):
        try:
            import subprocess
            import sys
            subprocess.check_call(
                [sys.executable,
                 os.path.join(os.path.dirname(path), "..", "..", "native",
                              "build.py")],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for name, nargs in (("bls_g1_add", 3), ("bls_g1_neg", 2),
                        ("bls_g1_mul", 3), ("bls_g1_multiexp", 4),
                        ("bls_g2_add", 3), ("bls_g2_neg", 2),
                        ("bls_g2_mul", 3), ("bls_pairing", 3),
                        ("bls_fq12_mul", 3), ("bls_fq12_inv", 2),
                        ("bls_fq12_pow", 3)):
        fn = getattr(lib, name)
        fn.restype = None
        args = [u8p] * nargs
        if name == "bls_g1_multiexp":
            args = [u8p, u8p, u8p, ctypes.c_int]
        fn.argtypes = args
    for grp in ("g1", "g2"):
        try:
            sz = getattr(lib, f"bls_{grp}_table_size")
            sz.restype = ctypes.c_int
            sz.argtypes = [ctypes.c_int]
            pre = getattr(lib, f"bls_{grp}_precompute")
            pre.restype = None
            pre.argtypes = [u8p, u8p, ctypes.c_int]
            mt = getattr(lib, f"bls_{grp}_mul_table")
            mt.restype = None
            mt.argtypes = [u8p, u8p, u8p, ctypes.c_int]
        except AttributeError:       # stale .so without the table API
            pass
    return lib


LIB = _load()

_G1_SZ, _G2_SZ, _FQ12_SZ = 97, 193, 576


def _buf(n):
    return (ctypes.c_uint8 * n)()


def _u8(b: bytes):
    return (ctypes.c_uint8 * len(b)).from_buffer_copy(b)


# -- serialization to/from pairing.py objects --------------------------------

def _fq_bytes(v: int) -> bytes:
    return v.to_bytes(48, "little")


def g1_ser(p: pp.CurvePoint) -> bytes:
    if p.is_infinity():
        return b"\0" * 96 + b"\1"
    x, y = p.affine()
    return _fq_bytes(x.v) + _fq_bytes(y.v) + b"\0"


def g1_deser(b) -> pp.CurvePoint:
    b = bytes(b)
    if b[96]:
        return pp.CurvePoint.infinity(pp.B1, pp.Fq)
    x = int.from_bytes(b[:48], "little")
    y = int.from_bytes(b[48:96], "little")
    return pp.CurvePoint(pp.Fq(x), pp.Fq(y), pp.Fq.one(), pp.B1, pp.Fq)


def g2_ser(p: pp.CurvePoint) -> bytes:
    if p.is_infinity():
        return b"\0" * 192 + b"\1"
    x, y = p.affine()
    return (_fq_bytes(x.a.v) + _fq_bytes(x.b.v)
            + _fq_bytes(y.a.v) + _fq_bytes(y.b.v) + b"\0")


def g2_deser(b) -> pp.CurvePoint:
    b = bytes(b)
    if b[192]:
        return pp.CurvePoint.infinity(pp.B2, pp.Fq2)
    vals = [int.from_bytes(b[i * 48:(i + 1) * 48], "little")
            for i in range(4)]
    return pp.CurvePoint(pp.Fq2.of(vals[0], vals[1]),
                         pp.Fq2.of(vals[2], vals[3]),
                         pp.Fq2.one(), pp.B2, pp.Fq2)


def fq12_ser(x: pp.Fq12) -> bytes:
    out = b""
    for c in x.c:
        out += _fq_bytes(c.a.v) + _fq_bytes(c.b.v)
    return out


def fq12_deser(b) -> pp.Fq12:
    b = bytes(b)
    cs = []
    for i in range(6):
        a = int.from_bytes(b[i * 96:i * 96 + 48], "little")
        bb = int.from_bytes(b[i * 96 + 48:i * 96 + 96], "little")
        cs.append(pp.Fq2.of(a, bb))
    return pp.Fq12(cs)


def _scalar(k: int) -> bytes:
    return (k % pp.R).to_bytes(32, "little")


# -- operations ---------------------------------------------------------------

def g1_mul(p: pp.CurvePoint, k: int) -> pp.CurvePoint:
    out = _buf(_G1_SZ)
    LIB.bls_g1_mul(out, _u8(g1_ser(p)), _u8(_scalar(k)))
    return g1_deser(out)


def g1_add(p: pp.CurvePoint, q: pp.CurvePoint) -> pp.CurvePoint:
    out = _buf(_G1_SZ)
    LIB.bls_g1_add(out, _u8(g1_ser(p)), _u8(g1_ser(q)))
    return g1_deser(out)


def g1_multiexp(pts, scalars) -> pp.CurvePoint:
    n = len(pts)
    flat_p = b"".join(g1_ser(p) for p in pts)
    flat_s = b"".join(_scalar(int(s)) for s in scalars)
    out = _buf(_G1_SZ)
    LIB.bls_g1_multiexp(out, _u8(flat_p), _u8(flat_s), n)
    return g1_deser(out)


class FixedBaseTable:
    """Fixed-base window table for repeated scalar mults of one point (the
    reference's wNAF ``preprocess()``, pairing/src/lib.rs + wnaf.rs).
    ``group`` is 'g1' or 'g2'; ``w`` the window width in bits."""

    def __init__(self, group: str, point: pp.CurvePoint, w: int = 5):
        self.group, self.w = group, w
        ser = g1_ser if group == "g1" else g2_ser
        self._out_sz = _G1_SZ if group == "g1" else _G2_SZ
        size = getattr(LIB, f"bls_{group}_table_size")(w)
        self._table = _buf(size)
        getattr(LIB, f"bls_{group}_precompute")(self._table, _u8(ser(point)), w)
        self._mul = getattr(LIB, f"bls_{group}_mul_table")
        self._deser = g1_deser if group == "g1" else g2_deser

    def mul(self, k: int) -> pp.CurvePoint:
        out = _buf(self._out_sz)
        self._mul(out, self._table, _u8(_scalar(int(k))), self.w)
        return self._deser(out)


def g2_mul(p: pp.CurvePoint, k: int) -> pp.CurvePoint:
    out = _buf(_G2_SZ)
    LIB.bls_g2_mul(out, _u8(g2_ser(p)), _u8(_scalar(k)))
    return g2_deser(out)


def g2_add(p: pp.CurvePoint, q: pp.CurvePoint) -> pp.CurvePoint:
    out = _buf(_G2_SZ)
    LIB.bls_g2_add(out, _u8(g2_ser(p)), _u8(g2_ser(q)))
    return g2_deser(out)


def pairing(p: pp.CurvePoint, q: pp.CurvePoint) -> pp.Fq12:
    out = _buf(_FQ12_SZ)
    LIB.bls_pairing(out, _u8(g1_ser(p)), _u8(g2_ser(q)))
    return fq12_deser(out)


def fq12_mul(a: pp.Fq12, b: pp.Fq12) -> pp.Fq12:
    out = _buf(_FQ12_SZ)
    LIB.bls_fq12_mul(out, _u8(fq12_ser(a)), _u8(fq12_ser(b)))
    return fq12_deser(out)


def fq12_inv(a: pp.Fq12) -> pp.Fq12:
    out = _buf(_FQ12_SZ)
    LIB.bls_fq12_inv(out, _u8(fq12_ser(a)))
    return fq12_deser(out)


def fq12_pow(a: pp.Fq12, k: int) -> pp.Fq12:
    out = _buf(_FQ12_SZ)
    LIB.bls_fq12_pow(out, _u8(fq12_ser(a)), _u8(_scalar(k)))
    return fq12_deser(out)
