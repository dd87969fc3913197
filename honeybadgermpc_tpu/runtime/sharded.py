"""Run MPC *programs* (the L4/L6 surface) under shard_map over a party mesh.

TPU-native analogue of the reference's per-party program execution: the
reference runs one ``Mpc`` context per party, each consuming its slice of
the preprocessing files and exchanging messages over the network
(mpc.py:280-306 TaskProgramRunner, ipc.py:117-170 ProcessProgramRunner).
Here the same program text runs per-party inside ``shard_map`` over a
``Mesh(..., ('parties',))``: preprocessing tensors are sharded on the
party axis, every nonlinear op's open lowers to ICI collectives
(MeshBackend / HybridBackend), and the whole program — Beaver multiplies,
comparisons, MiMC rounds — compiles to ONE sharded XLA program.

Two placement modes (mirroring parallel/reconstruct.py's reconstruct
factories):

* ``mode='mesh'``   — one party per device (``MeshBackend``; local share
  tensors carry NO party axis — the ProcessProgramRunner shape).
* ``mode='hybrid'`` — n parties over D devices, n/D simulated per device
  (``HybridBackend``; local tensors carry a leading [n/D] axis — how a
  64-party network runs on an 8-chip slice).

The SimBackend path (runtime/context.py) and these sharded paths execute
the same ShareArray program text; tests assert bit-exact agreement when
fed identical dealer preprocessing (tests/test_sharded_context.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as PS

from ..ops.fparray import FpArray
from ..parallel.mesh import ByzantineBackend, HybridBackend, MeshBackend
from .context import MpcContext, ShareArray
from .preprocessing import PreProcessedElements


class LocalPreproc:
    """Trace-time preprocessing consumer for sharded programs.

    Holds this party's (or device's) local share tensors per kind and
    serves the ``PreProcessedElements`` get_* API cursor-style. Cursors
    are Python ints consumed during tracing, so slicing is static; each
    fresh trace of the enclosing program restarts at 0 and therefore
    consumes the same tensor slices — the caller deals fresh tensors per
    run when fresh randomness is required (same contract as the
    reference's deterministic order-of-encounter share ids, mpc.py:47-56).

    Array shapes: [pp?, count] or [pp?, count, parts] — the count axis is
    ``lead``; kinds with parts (triples/cubes: 3, double_shares: 2,
    share_bits: 1+bits) keep them trailing, exactly the pool layout of
    runtime/preprocessing.py.
    """

    _PARTS = {"triples": 3, "cubes": 3, "double_shares": 2}

    def __init__(self, arrays: dict[str, FpArray], lead: int):
        self.arrays = arrays
        self.lead = lead
        self.cursors = {k: 0 for k in arrays}

    def _take(self, kind: str, k: int) -> FpArray:
        arr = self.arrays[kind]
        c = self.cursors[kind]
        axis = self.lead                       # count axis (element coords)
        assert c + k <= arr.shape[axis], (
            f"sharded preproc pool '{kind}' exhausted: "
            f"have {arr.shape[axis]}, cursor {c}, want {k}")
        self.cursors[kind] = c + k
        return FpArray(jax.lax.slice_in_dim(arr.limbs, c, c + k,
                                            axis=axis + 1))

    def get_triples(self, k):
        s = self._take("triples", k)
        return (FpArray(s.limbs[..., 0]), FpArray(s.limbs[..., 1]),
                FpArray(s.limbs[..., 2]))

    def get_cubes(self, k):
        s = self._take("cubes", k)
        return (FpArray(s.limbs[..., 0]), FpArray(s.limbs[..., 1]),
                FpArray(s.limbs[..., 2]))

    def get_double_shares(self, k):
        s = self._take("double_shares", k)
        return FpArray(s.limbs[..., 0]), FpArray(s.limbs[..., 1])

    def get_rands(self, k):
        return self._take("rands", k)

    def get_zeros(self, k):
        return self._take("zeros", k)

    def get_bits(self, k):
        return self._take("bits", k)

    def get_one_minus_ones(self, k):
        return self._take("one_minus_ones", k)

    def get_share_bits(self, k):
        s = self._take("share_bits", k)
        return FpArray(s.limbs[..., 0]), FpArray(s.limbs[..., 1:])


def snapshot_preproc(pre: PreProcessedElements,
                     kinds: dict[str, int]) -> dict[str, FpArray]:
    """Consume ``kinds[kind]`` elements from a trusted dealer into global
    [n, count(, parts)] tensors for sharding (the reference's per-party
    share files, preprocessing.py:152-169, as one tensor per kind)."""
    out = {}
    for kind, count in kinds.items():
        if kind in ("triples", "cubes"):
            a, b, c = getattr(pre, f"get_{kind}")(count)
            out[kind] = FpArray.stack([a, b, c], axis=2)
        elif kind == "double_shares":
            r_t, r_2t = pre.get_double_shares(count)
            out[kind] = FpArray.stack([r_t, r_2t], axis=2)
        elif kind == "share_bits":
            r, bits = pre.get_share_bits(count)
            out[kind] = FpArray.concatenate(
                [FpArray(r.limbs[..., None]), bits], axis=2)
        else:
            out[kind] = getattr(pre, f"get_{kind}")(count)
    return out


def make_sharded_mpc_program(mesh, n: int, t: int, prog,
                             mode: str = "mesh", robust: bool = True,
                             mixins=None, use_omega_powers: bool = False,
                             fault_parties=(), return_nerr: bool = False):
    """Compile ``prog(ctx, *inputs) -> ShareArray | FpArray | tuple`` into
    one jitted sharded program.

    Returns ``run(preproc: dict[str, FpArray], *inputs: FpArray)`` whose
    arguments are GLOBAL tensors with the party axis leading ([n, ...]);
    they are sharded over the mesh's 'parties' axis, the program executes
    per-party with ICI collectives, and outputs come back as global
    [n, ...] FpArrays (each party's local view re-concatenated).

    ``fault_parties``: party ids that behave Byzantine — they corrupt every
    value they contribute to a collective INSIDE the program's opens
    (ByzantineBackend; reference config.py:38-45 induce_faults through full
    program runs, mpc.py:126-131). With ``robust=True`` and at most t
    faults the outputs must equal the fault-free run's bit-exactly.

    ``return_nerr``: append one extra [1, n] int32 output — each party's
    total corrected-error count across every open in the program.
    """
    ndev = int(np.prod(mesh.devices.shape))
    if mode == "mesh":
        assert ndev == n, (ndev, n)
        pp = 1
    elif mode == "hybrid":
        assert n % ndev == 0, (n, ndev)
        pp = n // ndev
    else:
        raise ValueError(mode)

    def local_fn(pre_limbs: dict, in_limbs: tuple):
        backend = MeshBackend(n) if mode == "mesh" else HybridBackend(n, ndev)
        if fault_parties:
            backend = ByzantineBackend(backend, fault_parties)
        lead = 0 if mode == "mesh" else 1

        def adapt(limbs):                     # local [L, pp, ...] from spec
            return FpArray(limbs[:, 0] if mode == "mesh" else limbs)

        pre = LocalPreproc({k: adapt(v) for k, v in pre_limbs.items()}, lead)
        ctx = MpcContext(n, t, backend=backend, preproc=pre, mixins=mixins,
                         robust=robust, use_omega_powers=use_omega_powers)
        ins = tuple(ctx.ShareArray(adapt(l)) for l in in_limbs)
        out = prog(ctx, *ins)
        outs = out if isinstance(out, tuple) else (out,)

        def restore(o):
            v = o.v if isinstance(o, ShareArray) else o
            assert isinstance(v, FpArray), type(v)
            return v.limbs[:, None] if mode == "mesh" else v.limbs

        restored = tuple(restore(o) for o in outs)
        if return_nerr:
            # local [1, pp] (mesh: [1, 1]) -> global [1, n] under the
            # PS(None, 'parties') prefix spec
            nerr = jnp.asarray(ctx.nerr_total, jnp.int32)
            nerr = jnp.broadcast_to(nerr.reshape(-1), (pp,))[None]
            restored = restored + (nerr,)
        return restored

    # P(None, 'parties') as a tree PREFIX: every leaf is [L, party, ...],
    # sharded on axis 1, trailing dims replicated
    f = jax.shard_map(local_fn, mesh=mesh, in_specs=PS(None, "parties"),
                      out_specs=PS(None, "parties"), check_vma=False)

    @jax.jit
    def run(preproc: dict, *inputs: FpArray):
        pre_limbs = {k: v.limbs for k, v in preproc.items()}
        outs = f(pre_limbs, tuple(x.limbs for x in inputs))
        if return_nerr:
            return tuple(FpArray(o) for o in outs[:-1]) + (outs[-1][0],)
        return tuple(FpArray(o) for o in outs)

    return run
