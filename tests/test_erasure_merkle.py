"""Direct unit tests for the broadcast layer's erasure striping and
Merkle proofs (reference broadcast/reliablebroadcast.py:19-134; previously
covered only indirectly through RBC). Includes native-C++ vs pure-Python
path equivalence for the GF(p) striping."""

import itertools

import pytest

from honeybadgermpc_tpu.protocols import erasure
from honeybadgermpc_tpu.protocols.merkle import (merkle_branch, merkle_root,
                                                 merkle_tree, merkle_verify)


@pytest.mark.parametrize("k,n", [(2, 4), (3, 7), (5, 16)])
@pytest.mark.parametrize("size", [0, 1, 200, 10_000])
def test_erasure_roundtrip(rng, k, n, size):
    data = bytes(rng.randrange(256) for _ in range(size))
    stripes = erasure.encode(k, n, data)
    assert len(stripes) == n
    # any k-subset reconstructs — exercise several, incl. non-prefix ones
    subsets = list(itertools.combinations(range(n), k))
    rng.shuffle(subsets)
    for zs in subsets[:4] + [tuple(range(n - k, n))]:
        got = [stripes[j] if j in zs else None for j in range(n)]
        assert erasure.decode(k, n, got) == data


def test_erasure_native_matches_python(rng, monkeypatch):
    """The C++ rs_encode / lagrange_interpolate path and the pure-Python
    path produce identical stripes and decodes (the RBC wire format must
    not depend on which is available)."""
    from honeybadgermpc_tpu.native import get_native
    if get_native() is None:
        pytest.skip("native extension unavailable")
    k, n = 3, 7
    data = bytes(rng.randrange(256) for _ in range(5000))
    native_stripes = erasure.encode(k, n, data)

    monkeypatch.setattr(erasure, "_native", lambda: None)
    py_stripes = erasure.encode(k, n, data)
    assert native_stripes == py_stripes
    got = [py_stripes[j] if j in (1, 4, 6) else None for j in range(n)]
    py_dec = erasure.decode(k, n, got)
    monkeypatch.undo()
    assert erasure.decode(k, n, got) == py_dec == data


def test_erasure_stripe_serialization(rng):
    stripe = [rng.randrange(erasure.P) for _ in range(5)]
    assert erasure.deserialize_stripe(
        erasure.serialize_stripe(stripe)) == stripe


def test_erasure_too_few_stripes(rng):
    k, n = 3, 7
    stripes = erasure.encode(k, n, b"hello")
    got = [stripes[0], stripes[1]] + [None] * (n - 2)
    with pytest.raises(AssertionError):
        erasure.decode(k, n, got)


@pytest.mark.parametrize("n_leaves", [1, 2, 5, 8])
def test_merkle_branch_verify_all_leaves(rng, n_leaves):
    leaves = [bytes([i]) * 20 for i in range(n_leaves)]
    tree = merkle_tree(leaves)
    root = merkle_root(tree)
    for i in range(n_leaves):
        br = merkle_branch(tree, i)
        assert merkle_verify(n_leaves, leaves[i], root, br, i)


def test_merkle_rejects_forgeries():
    n = 5
    leaves = [bytes([i]) * 20 for i in range(n)]
    tree = merkle_tree(leaves)
    root = merkle_root(tree)
    br = merkle_branch(tree, 2)
    # tampered leaf
    assert not merkle_verify(n, b"evil" * 5, root, br, 2)
    # wrong index (out of range, and in-range-but-mismatched)
    assert not merkle_verify(n, leaves[2], root, br, 7)
    assert not merkle_verify(n, leaves[2], root, br, 3)
    # truncated branch (length check, reliablebroadcast.py:117-134)
    assert not merkle_verify(n, leaves[2], root, br[:-1], 2)
    # branch from another leaf
    assert not merkle_verify(n, leaves[2], root, merkle_branch(tree, 1), 2)
