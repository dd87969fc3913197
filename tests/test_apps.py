"""Application programs: butterfly shuffling network, power mixing, and
the contract-coordinated asynchromix service (mirrors reference
apps/asynchromix tests/benchmarks)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "apps"))

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


def test_coordinator_contract_state_machine():
    """The in-process coordinator double enforces the contract's state
    machine (apps/contracts/AsynchromixCoordinator.sol): min-consensus
    preprocessing reports, authorized single-use masks, K-input epoch
    initiation, and t+1 matching votes to certify an output."""
    from evm_double import AsynchromixCoordinator, Revert

    servers = [f"s{i}" for i in range(4)]
    c = AsynchromixCoordinator(servers, t=1, k=4)

    # consensus buffer = MIN over per-server reports
    with pytest.raises(Revert):
        c.preprocess_report([9, 9, 9], sender="not-a-server")
    for s in servers[:3]:
        c.preprocess_report([8, 8, 9], sender=s)
    assert c.inputmasks_available() == 0        # server 3 hasn't reported
    c.preprocess_report([8, 8, 5], sender=servers[3])
    assert c.inputmasks_available() == 5
    assert c.mixes_available() == 1             # PER_MIX = (4/2)*2*2 = 8

    # masks: claimed once, bound to the claimer, single-use
    with pytest.raises(Revert):
        c.submit_message(0, 123, sender="alice")
    r = c.reserve_inputmask(sender="alice")
    idx = r.events[0].args["inputmask_idx"]
    assert c.client_authorized("alice", idx) and not \
        c.client_authorized("bob", idx)
    with pytest.raises(Revert):
        c.submit_message(idx, 123, sender="bob")
    c.submit_message(idx, 123, sender="alice")
    with pytest.raises(Revert):                 # single use
        c.submit_message(idx, 456, sender="alice")

    # epoch initiation needs K inputs
    with pytest.raises(Revert):
        c.initiate_mix()
    for j in range(3):
        i2 = c.reserve_inputmask(
            sender=f"c{j}").events[0].args["inputmask_idx"]
        c.submit_message(i2, 1000 + j, sender=f"c{j}")
    c.initiate_mix()
    assert c.epochs_initiated == 1
    assert c.get_events("MixingEpochInitiated")[0].args["epoch"] == 0
    assert c.mixes_available() == 0             # budget consumed

    # output certification: t+1 = 2 matching votes
    c.propose_output(0, "a,b", sender=servers[0])
    assert c.outputs_ready == 0
    with pytest.raises(Revert):                 # no double voting
        c.propose_output(0, "a,b", sender=servers[0])
    with pytest.raises(Revert):                 # conflicting output
        c.propose_output(0, "x,y", sender=servers[1])
    c.propose_output(0, "a,b", sender=servers[1])
    assert c.outputs_ready == 1
    assert c.get_events("MixOutput")[0].args["output"] == "a,b"


def test_coordinator_surface_matches_sol_artifact():
    """Every function and event the Python double exposes exists in the
    shipped contract artifact (they must not drift apart)."""
    sol = open(os.path.join(
        REPO, "apps", "contracts", "AsynchromixCoordinator.sol")).read()
    for fn in ("preprocess_report", "inputmasks_available",
               "reserve_inputmask", "client_authorized", "submit_message",
               "input_queue_length", "inputs_ready", "mixes_available",
               "initiate_mix", "propose_output"):
        assert f"function {fn}" in sol, fn
    for ev in ("PreProcessUpdated", "InputMaskClaimed", "MessageSubmitted",
               "MixingEpochInitiated", "MixOutput"):
        assert f"event {ev}" in sol, ev
    for const in ("K", "PER_MIX_TRIPLES", "PER_MIX_BITS"):
        assert const in sol, const


def test_asynchromix_event_driven_epoch():
    """Full client->contract->server flow, one epoch: clients reserve
    masks and publish masked inputs, servers report preprocessing, a mix
    is initiated on-chain, the MPC runs, and t+1 votes certify the output
    (reference asynchromix.py:55-130 client flow, :144-320 server loops)."""
    import asyncio

    from asynchromix import run_one_epoch

    messages, mixed = asyncio.run(
        asyncio.wait_for(run_one_epoch(n=4, t=1, k=4, seed=13), 600))
    assert sorted(messages) == sorted(mixed)


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
