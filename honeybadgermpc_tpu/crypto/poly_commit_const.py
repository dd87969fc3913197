"""KZG-style constant-size polynomial commitment, Pedersen-hiding variant
(reference poly_commit_const.py: commit :15, create_witness :29, pairing
verify :47, batch verify :56, CRS gen :90 — the PolyCommit_Ped scheme).

Commitment C = prod g^(alpha^j * phi_j) * h^(alpha^j * phihat_j) is a single
G1 element; the witness for an evaluation is a commitment to the quotient
polynomial; verification is one pairing equation."""

from __future__ import annotations

import random

from ..betterpairing import G1, G2, ZR, pair
from ..crypto.pairing import R


def gen_pc_const_crs(t: int, alpha=None, g=None, h=None, ghat=None, seed=None):
    """CRS for degree-t polynomials (poly_commit_const.py:90-113). alpha is
    toxic waste — test/dealer use only."""
    rng = random.Random(seed)
    alpha = ZR(alpha if alpha is not None else rng.randrange(2, R - 1))
    g = g or G1.rand(b"pcg")
    h = h or G1.rand(b"pch")
    ghat = ghat or G2.rand(b"pcg2")
    gs = [g ** (alpha ** j) for j in range(t + 2)]
    hs = [h ** (alpha ** j) for j in range(t + 2)]
    ghats = [ghat, ghat ** alpha]
    return (gs, hs, ghats)


class PolyCommitConst:
    def __init__(self, crs):
        self.gs, self.hs, self.ghats = crs
        self.t = len(self.gs) - 2

    def commit(self, phi, phi_hat=None):
        """phi: coefficients (list/Polynomial); phi_hat: blinding poly
        (random if None). Returns (commitment, phi_hat)."""
        coeffs = _coeffs(phi)
        if phi_hat is None:
            phi_hat = [ZR.rand() for _ in coeffs]
        c = G1.identity()
        for j, (a, b) in enumerate(zip(coeffs, phi_hat)):
            c = c * (self.gs[j] ** a) * (self.hs[j] ** b)
        return c, phi_hat

    def create_witness(self, phi, phi_hat, i: int):
        """Witness for point i: commitment to the quotient polynomials
        (phi(x)-phi(i))/(x-i), (phihat(x)-phihat(i))/(x-i)."""
        qp = _quotient(_coeffs(phi), i)
        qh = _quotient([ZR(int(c)) for c in phi_hat], i)
        w = G1.identity()
        for j, (a, b) in enumerate(zip(qp, qh)):
            w = w * (self.gs[j] ** a) * (self.hs[j] ** b)
        return w

    def verify_eval(self, c, i: int, phi_at_i, phi_hat_at_i, witness) -> bool:
        """e(C / (g^phi(i) h^phihat(i)), ghat) == e(w, ghat^alpha / ghat^i)."""
        lhs_num = c / ((self.gs[0] ** ZR(int(phi_at_i))) *
                       (self.hs[0] ** ZR(int(phi_hat_at_i))))
        lhs = pair(lhs_num, self.ghats[0])
        rhs = pair(witness, self.ghats[1] / (self.ghats[0] ** ZR(i)))
        return lhs == rhs

    def batch_verify_eval(self, commits, i: int, shares, auxes, witnesses) -> bool:
        """Product trick: one pairing equation for a batch of commitments
        at the same point (poly_commit_const.py:56-87)."""
        assert len(commits) == len(shares) == len(auxes) == len(witnesses)
        c_prod = G1.identity()
        w_prod = G1.identity()
        s_sum, a_sum = ZR(0), ZR(0)
        for c, s, a, w in zip(commits, shares, auxes, witnesses):
            c_prod = c_prod * c
            w_prod = w_prod * w
            s_sum = s_sum + ZR(int(s))
            a_sum = a_sum + ZR(int(a))
        lhs = pair(c_prod / ((self.gs[0] ** s_sum) * (self.hs[0] ** a_sum)),
                   self.ghats[0])
        rhs = pair(w_prod, self.ghats[1] / (self.ghats[0] ** ZR(i)))
        return lhs == rhs


def _coeffs(phi):
    if hasattr(phi, "coeffs"):
        return [ZR(int(c)) for c in phi.coeffs]
    return [ZR(int(c)) for c in phi]


def _quotient(coeffs, i: int):
    """(phi(x) - phi(i)) / (x - i) by synthetic division:
    q_{k-2} = c_{k-1};  q_{j-1} = c_j + i * q_j."""
    k = len(coeffs)
    if k <= 1:
        return [ZR(0)]
    q = [ZR(0)] * (k - 1)
    carry = ZR(0)
    for j in range(k - 1, 0, -1):
        carry = coeffs[j] + ZR(i) * carry
        q[j - 1] = carry
    return q


def eval_poly(coeffs, x):
    y = ZR(0)
    for c in reversed([ZR(int(c)) for c in coeffs]):
        y = y * ZR(x) + c
    return y
