"""Boldyreva threshold BLS signatures (reference
broadcast/crypto/boldyreva.py: TBLSPublicKey :45-151, TBLSPrivateKey :153,
dealer :174).

The reference builds on Charm/PBC MNT224; here it rides the framework's own
BLS12-381 pairing. Signature shares live in G1 (hash-to-G1 messages),
public keys in G2 — so verification is e(sig, g2) == e(H(m), vk).
"""

from __future__ import annotations

import random

from ..betterpairing import G1, G2, ZR, lagrange_at_x, pair


class TBLSPublicKey:
    def __init__(self, l, k, vk: G2, vks: list):
        self.l = l          # number of players
        self.k = k          # threshold (k shares combine)
        self.vk = vk        # g2^secret
        self.vks = vks      # g2^share_i per player

    def lagrange(self, s: set, j: int) -> ZR:
        """Coefficient for player j (0-indexed) over set s at x=0
        (boldyreva.py:95-113)."""
        assert len(s) == self.k and j in s
        one_indexed = {jj + 1 for jj in s}
        return lagrange_at_x(one_indexed, j + 1, 0)

    def hash_message(self, m: bytes) -> G1:
        return G1.hash_to_curve(m)

    def verify_share(self, sig: G1, i: int, h: G1) -> bool:
        """e(sig_i, g2) == e(h, vk_i) (boldyreva.py:114-119)."""
        return pair(sig, G2()) == pair(h, self.vks[i])

    def verify_signature(self, sig: G1, h: G1) -> bool:
        return pair(sig, G2()) == pair(h, self.vk)

    def combine_shares(self, sigs: dict) -> G1:
        """{player: share} with exactly k entries -> full signature
        (boldyreva.py:126-135)."""
        s = set(sigs.keys())
        assert len(s) == self.k
        out = G1.identity()
        for j, sig in sigs.items():
            out = out * (sig ** self.lagrange(s, j))
        return out


class TBLSPrivateKey(TBLSPublicKey):
    def __init__(self, l, k, vk, vks, sk: ZR, i: int):
        super().__init__(l, k, vk, vks)
        self.i = i
        self.sk = sk

    def sign(self, h: G1) -> G1:
        """h^sk (boldyreva.py:153-171)."""
        return h ** self.sk


def dealer(players: int, k: int, seed=None):
    """Trusted dealer: polynomial sharing of a BLS secret
    (boldyreva.py:174-220). Returns (public_key, [private_keys])."""
    rng = random.Random(seed)
    coeffs = [ZR(rng.randrange(1, int(2 ** 255))) for _ in range(k)]
    secret = coeffs[0]

    def f(x):
        y, xx = ZR(0), ZR(1)
        for c in coeffs:
            y = y + c * xx
            xx = xx * ZR(x)
        return y

    sks = [f(i) for i in range(1, players + 1)]
    vk = G2() ** secret
    vks = [G2() ** s for s in sks]
    pub = TBLSPublicKey(players, k, vk, vks)
    privs = [TBLSPrivateKey(players, k, vk, vks, sk, i)
             for i, sk in enumerate(sks)]
    # sanity: lagrange reconstruction at 0 equals the secret
    s = set(range(k))
    rec = ZR(0)
    for j in s:
        rec = rec + pub.lagrange(s, j) * sks[j]
    assert rec == secret
    return pub, privs
