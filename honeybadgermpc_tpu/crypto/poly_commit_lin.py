"""Pedersen per-coefficient polynomial commitment (reference
poly_commit_lin.py:12-41): linear-size commitments, information-
theoretically hiding."""

from __future__ import annotations

from ..betterpairing import G1, ZR


class PolyCommitLin:
    def __init__(self, crs=None):
        if crs is None:
            crs = [G1.rand(b"g"), G1.rand(b"h")]
        assert len(crs) == 2
        self.g, self.h = crs

    def commit(self, phi):
        """phi: list of ZR coefficients (or host Polynomial). Returns
        (commitments per coefficient, auxiliary blinding poly coeffs)."""
        coeffs = _coeffs(phi)
        aux = [ZR.rand() for _ in coeffs]
        cs = [(self.g ** c) * (self.h ** a) for c, a in zip(coeffs, aux)]
        return cs, aux

    def create_witness(self, aux, i: int) -> ZR:
        """Witness for evaluation at point i = aux polynomial at i."""
        return _eval(aux, i)

    def verify_eval(self, cs, i: int, phi_at_i: ZR, witness: ZR) -> bool:
        """prod c_j^(i^j) == g^phi(i) h^witness."""
        lhs = G1.identity()
        x = ZR(1)
        for c in cs:
            lhs = lhs * (c ** x)
            x = x * ZR(i)
        rhs = (self.g ** phi_at_i) * (self.h ** witness)
        return lhs == rhs


def _coeffs(phi):
    if hasattr(phi, "coeffs"):
        return [ZR(int(c)) for c in phi.coeffs]
    return [ZR(int(c)) for c in phi]


def _eval(coeffs, x):
    y = ZR(0)
    for c in reversed([ZR(int(c)) for c in coeffs]):
        y = y * ZR(x) + c
    return y
