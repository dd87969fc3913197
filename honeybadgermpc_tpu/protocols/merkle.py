"""SHA-256 Merkle trees with branch proofs (reference
broadcast/reliablebroadcast.py:86-134)."""

from __future__ import annotations

import hashlib
from math import ceil, log2


def _hash(x: bytes) -> bytes:
    return hashlib.sha256(x).digest()


def merkle_tree(leaves) -> list:
    """1-indexed binary tree array; leaves padded to a power of two."""
    n = len(leaves)
    size = 2 ** ceil(log2(max(n, 1))) if n > 1 else 1
    tree = [b""] * (2 * size)
    for i in range(n):
        tree[size + i] = _hash(leaves[i])
    for i in range(size - 1, 0, -1):
        tree[i] = _hash(tree[2 * i] + tree[2 * i + 1])
    return tree


def merkle_root(tree) -> bytes:
    return tree[1]


def merkle_branch(tree, index: int) -> list:
    """Sibling path for leaf `index`."""
    size = len(tree) // 2
    res = []
    t = index + size
    while t > 1:
        res.append(tree[t ^ 1])
        t //= 2
    return res


def merkle_verify(n_leaves: int, leaf: bytes, root: bytes, branch, index: int) -> bool:
    """Verify a leaf against a root (reliablebroadcast.py:117-134)."""
    size = 2 ** ceil(log2(max(n_leaves, 1))) if n_leaves > 1 else 1
    if index < 0 or index >= n_leaves:
        return False
    if len(branch) != size.bit_length() - 1:  # log2(size); 0 for one leaf
        return False
    tmp = _hash(leaf)
    t = index
    for br in branch:
        tmp = _hash(br + tmp) if t % 2 else _hash(tmp + br)
        t //= 2
    return tmp == root
