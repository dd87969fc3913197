"""Application programs: butterfly shuffling network and power mixing
(mirrors reference apps/asynchromix tests/benchmarks)."""

import numpy as np
import pytest

from honeybadgermpc_tpu.models.butterfly import iterated_butterfly_network
from honeybadgermpc_tpu.models.powermixing import (find_roots,
                                                   newton_inversion,
                                                   power_mix)
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.runtime.context import MpcContext
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements


@pytest.fixture
def ctx():
    n, t = 4, 1
    pre = PreProcessedElements(n, t, seed=41)
    pre.generate_triples(2048)
    pre.generate_one_minus_ones(512)
    pre.generate_powers(8, 8)
    return MpcContext(n, t, preproc=pre)


def test_butterfly_network_permutes(ctx, rng):
    k = 8
    vals = [rng.randrange(P) for _ in range(k)]
    inp = ctx.ShareArray(ctx.preproc._share_values(FpArray.from_ints(vals)))
    out = iterated_butterfly_network(ctx, inp, k)
    got = list(out.open().to_ints()[0])
    # a permutation of the inputs (with overwhelming probability shuffled)
    assert sorted(got) == sorted(vals)


def test_newton_and_roots(rng):
    msgs = sorted(rng.randrange(P) for _ in range(5))
    k = len(msgs)
    psums = [sum(pow(m, j, P) for m in msgs) % P for j in range(1, k + 1)]
    elem = newton_inversion(psums, k)
    roots = find_roots(elem)
    assert roots == msgs


def test_power_mix_end_to_end(ctx, rng):
    B = 4
    msgs = [rng.randrange(P) for _ in range(B)]
    m_sh = ctx.ShareArray(ctx.preproc._share_values(FpArray.from_ints(msgs)))
    b_powers = ctx.from_preproc(ctx.preproc.get_powers(B))
    got = power_mix(ctx, m_sh, b_powers)
    assert got == sorted(msgs)


def test_butterfly_network_jit():
    """One-dispatch butterfly (models/butterfly.py) permutes and matches
    the eager network's contract (reference butterfly_network.py:22-53)."""
    import math

    from honeybadgermpc_tpu.models.butterfly import \
        iterated_butterfly_network_jit
    from honeybadgermpc_tpu.ops.fparray import FpArray
    from honeybadgermpc_tpu.runtime.context import MpcContext
    from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

    n, t, k = 4, 1, 8
    R = int(math.log2(k)) ** 2
    pre = PreProcessedElements(n, t, seed=0)
    pre.generate_one_minus_ones(R * k)
    pre.generate_triples(R * k)
    ctx = MpcContext(n, t, preproc=pre)
    vals = list(range(50, 50 + k))
    xs = ctx.from_preproc(pre._share_values(FpArray.from_ints(vals)))
    opened = iterated_butterfly_network_jit(ctx, xs, k).open().to_ints()
    for j in range(n):
        assert sorted(int(v) for v in opened[j]) == sorted(vals)
