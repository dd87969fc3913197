"""High-level pairing-group API (reference betterpairing.py: G1 :43,
G2 :232, GT :436, ZR :575, lagrange_at_x :787, interpolate_g1_at_x :800).

Wraps crypto/pairing.py with the reference's class surface: seeded ``rand``,
``hash``, operator algebra, serialization, and Lagrange-in-the-exponent
interpolation used by commitment/witness recovery. ``preprocess`` is kept
as a no-op hook (the reference's wNAF tables are a pypairing optimization).
"""

from __future__ import annotations

import hashlib
import pickle
import random

from .crypto import pairing as pr
from .crypto.pairing import CurvePoint, Fq, Fq2, Fq12, R


class ZR:
    """Scalar field Fr (reference betterpairing.py:575-760)."""

    __slots__ = ("val",)

    def __init__(self, val=0):
        if isinstance(val, ZR):
            val = val.val
        elif isinstance(val, str):
            val = int(val, 0)
        self.val = int(val) % R

    @staticmethod
    def random(seed=None):
        return ZR(random.Random(seed).randint(0, R - 1))

    rand = random

    @staticmethod
    def hash(data: bytes):
        return ZR(int.from_bytes(hashlib.sha512(data).digest(), "big"))

    def __add__(self, o):
        return ZR(self.val + ZR(o).val)

    __radd__ = __add__

    def __sub__(self, o):
        return ZR(self.val - ZR(o).val)

    def __rsub__(self, o):
        return ZR(ZR(o).val - self.val)

    def __mul__(self, o):
        return ZR(self.val * ZR(o).val)

    __rmul__ = __mul__

    def __pow__(self, e):
        e = e.val if isinstance(e, ZR) else e
        return ZR(pow(self.val, e % (R - 1) if e >= 0 else e, R))

    def __neg__(self):
        return ZR(-self.val)

    def __truediv__(self, o):
        return self * ZR(o).inv()

    def inv(self):
        return ZR(pow(self.val, R - 2, R))

    def __invert__(self):
        return self.inv()

    def __eq__(self, o):
        return self.val == ZR(o).val if isinstance(o, (ZR, int)) else NotImplemented

    def __hash__(self):
        return hash(("ZR", self.val))

    def __int__(self):
        return self.val

    def __repr__(self):
        return f"ZR({self.val})"


class _GroupElement:
    """Common wrapper over CurvePoint (G1 or G2)."""

    __slots__ = ("pt",)
    _gen = None
    _hash_domain = b""

    def __init__(self, pt=None):
        self.pt = pt if pt is not None else self._generator().pt

    @classmethod
    def _generator(cls):
        raise NotImplementedError

    @classmethod
    def identity(cls):
        g = cls._generator().pt
        return cls(CurvePoint.infinity(g.b, g.F))

    one = identity

    @classmethod
    def rand(cls, seed=None):
        k = random.Random(seed).randint(1, R - 1)
        return cls(cls._generator().pt.mul(k))

    random = rand

    @classmethod
    def hash(cls, data: bytes):
        h = hashlib.sha256(cls._hash_domain + data).digest()
        k = int.from_bytes(h + hashlib.sha256(h).digest(), "big") % R
        return cls(cls._generator().pt.mul(k or 1))

    def __mul__(self, o):
        """Group operation (multiplicative notation, like the reference)."""
        assert isinstance(o, type(self))
        return type(self)(self.pt.add(o.pt))

    def __truediv__(self, o):
        return type(self)(self.pt.add(o.pt.neg()))

    def __pow__(self, e):
        e = e.val if isinstance(e, ZR) else int(e)
        return type(self)(self.pt.mul(e % R))

    def invert(self):
        return type(self)(self.pt.neg())

    def __invert__(self):
        return self.invert()

    def __eq__(self, o):
        return isinstance(o, type(self)) and self.pt.eq(o.pt)

    def __hash__(self):
        if self.pt.is_infinity():
            return hash((type(self).__name__, "inf"))
        x, y = self.pt.affine()
        return hash((type(self).__name__, repr(x), repr(y)))

    def preprocess(self, level=4):
        """wNAF precompute hook — no-op here (reference lib optimization)."""
        return self

    # -- serialization -----------------------------------------------------
    def __getstate__(self):
        if self.pt.is_infinity():
            return b"inf"
        x, y = self.pt.affine()
        return pickle.dumps(self._ser(x, y))

    def __setstate__(self, state):
        if state == b"inf":
            self.pt = type(self).identity().pt
            return
        x, y = self._deser(pickle.loads(state))
        g = self._generator().pt
        self.pt = CurvePoint(x, y, g.F.one(), g.b, g.F)


class G1(_GroupElement):
    _hash_domain = b"G1"

    @classmethod
    def _generator(cls):
        inst = object.__new__(cls)
        inst.pt = pr.g1_generator()
        return inst

    @staticmethod
    def _ser(x, y):
        return (x.v, y.v)

    @staticmethod
    def _deser(t):
        return Fq(t[0]), Fq(t[1])

    @staticmethod
    def hash_to_curve(data: bytes):
        """Proper hash-to-point (try-and-increment + cofactor clearing)."""
        return G1(pr.hash_to_g1(data))


class G2(_GroupElement):
    _hash_domain = b"G2"

    @classmethod
    def _generator(cls):
        inst = object.__new__(cls)
        inst.pt = pr.g2_generator()
        return inst

    @staticmethod
    def _ser(x, y):
        return (x.a.v, x.b.v, y.a.v, y.b.v)

    @staticmethod
    def _deser(t):
        return Fq2.of(t[0], t[1]), Fq2.of(t[2], t[3])


class GT:
    __slots__ = ("val",)

    def __init__(self, val=None):
        self.val = val if val is not None else Fq12.one()

    @staticmethod
    def identity():
        return GT(Fq12.one())

    def __mul__(self, o):
        nat = pr._native()
        if nat is not None:
            return GT(nat.fq12_mul(self.val, o.val))
        return GT(self.val * o.val)

    def __truediv__(self, o):
        nat = pr._native()
        if nat is not None:
            return GT(nat.fq12_mul(self.val, nat.fq12_inv(o.val)))
        return GT(self.val * o.val.inv())

    def __pow__(self, e):
        e = e.val if isinstance(e, ZR) else int(e)
        e %= R
        nat = pr._native()
        if nat is not None:
            return GT(nat.fq12_pow(self.val, e))
        return GT(self.val.pow(e))

    def __eq__(self, o):
        return isinstance(o, GT) and self.val == o.val

    def __hash__(self):
        return hash(self.val)


def pair(g1: G1, g2: G2) -> GT:
    return GT(pr.pairing(g1.pt, g2.pt))


def lagrange_at_x(s: set, j: int, x: int) -> ZR:
    """Lagrange coefficient for index j over index set s, evaluated at x
    (reference betterpairing.py:787-797; 1-indexed party convention of the
    caller is preserved — indices are used as-is)."""
    s = sorted(s)
    assert j in s
    num = ZR(1)
    den = ZR(1)
    for jj in s:
        if jj == j:
            continue
        num = num * ZR(x - jj)
        den = den * ZR(j - jj)
    return num / den


def interpolate_g1_at_x(coords, x: int, order=-1) -> G1:
    """Lagrange in the exponent: given [(idx, G1 point)] recover the group
    element at x (reference betterpairing.py:800-811). One native multiexp
    when the C++ backend is available."""
    if order == -1:
        order = len(coords)
    coords = coords[:order]
    s = {c[0] for c in coords}
    lams = [int(lagrange_at_x(s, idx, x)) for idx, _ in coords]
    from .crypto.pairing import _native
    nat = _native()
    if nat is not None:
        return G1(nat.g1_multiexp([y.pt for _, y in coords], lams))
    out = G1.identity()
    for (idx, y), lam in zip(coords, lams):
        out = out * (y ** ZR(lam))
    return out
