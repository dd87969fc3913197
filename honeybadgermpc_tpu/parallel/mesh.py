"""The n-party "network" as a JAX device mesh.

TPU-native replacement for the reference's communication layer (router.py
SimpleRouter, ipc.py NodeCommunicator/ZMQ): parties are devices along a mesh
axis; the reference's per-message sends become XLA collectives over ICI —
the R1 column fan-out of batch reconstruction is an all_to_all (transpose)
and the R2 constant broadcast is an all_gather (SURVEY §5: distributed
communication backend mapping).

Two interchangeable backends expose the same four primitives so every
protocol is written once:

* ``SimBackend`` — single-device simulation: the party axis is a leading
  batch axis; collectives are transposes/broadcasts. This is the analogue of
  the reference's in-process SimpleRouter (router.py:66) and is how tests
  run n=4..64 parties on one chip (protocol-instance batching).
* ``MeshBackend`` — real sharding: used inside ``shard_map`` over a
  ``Mesh(..., ('parties',))``; collectives are ``lax.all_to_all`` /
  ``lax.all_gather`` / ``lax.ppermute`` over the named axis (ICI).

Protocol code receives local FpArrays whose leading element axes are batch
dims either way, so the same program text runs simulated or sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fparray import FpArray
from ..ops.limbs import L


def party_mesh(n_parties: int, devices=None) -> Mesh:
    """A 1-D mesh with a 'parties' axis (n_parties must divide the device
    count; multiple parties per device are handled by SimBackend batching
    on top)."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_parties, (len(devices), n_parties)
    return Mesh(np.asarray(devices[:n_parties]), ("parties",))


def device_mesh(n_devices: int, devices=None) -> Mesh:
    """A 1-D 'parties' mesh over n_devices devices, for HybridBackend runs
    where several parties are simulated per device."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_devices, (len(devices), n_devices)
    return Mesh(np.asarray(devices[:n_devices]), ("parties",))


class SimBackend:
    """Party axis = axis `party_axis` of every element shape (default 0)."""

    def __init__(self, n: int):
        self.n = n

    def my_ids(self):
        """int32[n] party ids, for id-dependent protocol steps."""
        return jnp.arange(self.n, dtype=jnp.int32)

    def all_to_all(self, x: FpArray) -> FpArray:
        """x[party, ..., n] -> out[party, ..., n] with out[j,...,i] =
        x[i,...,j] (the R1 column transpose)."""
        # out[l, j, ..., i] = in[l, i, ..., j]; party axis is 1, last is -1
        return FpArray(jnp.swapaxes(x.limbs, 1, x.limbs.ndim - 1))

    def all_gather(self, x: FpArray) -> FpArray:
        """x[party, ...] -> out[party, ..., n] replicating every party's
        value to all parties on a new trailing axis."""
        limbs = jnp.moveaxis(x.limbs, 1, -1)        # [L, ..., n]
        limbs = jnp.broadcast_to(limbs[:, None, ...],
                                 (L, self.n) + limbs.shape[1:])
        return FpArray(limbs)

    def broadcast_from(self, x: FpArray, src: int) -> FpArray:
        """Every party receives party src's value (party axis preserved)."""
        limbs = x.limbs[:, src:src + 1, ...]
        return FpArray(jnp.broadcast_to(
            limbs, (L, self.n) + x.limbs.shape[2:]))


class MeshBackend:
    """For use INSIDE shard_map(..., mesh, in_specs=P('parties', ...)).
    Local arrays have no party axis; axis_name names the mesh axis."""

    def __init__(self, n: int, axis_name: str = "parties"):
        self.n = n
        self.axis = axis_name

    def my_ids(self):
        return jax.lax.axis_index(self.axis)

    def all_to_all(self, x: FpArray) -> FpArray:
        """local x[..., n] -> out[..., n]: out[..., i] = (party i's x[..., j])
        at party j — the cross-party transpose over ICI."""
        limbs = jax.lax.all_to_all(
            x.limbs, self.axis, split_axis=x.limbs.ndim - 1,
            concat_axis=x.limbs.ndim - 1, tiled=True)
        return FpArray(limbs)

    def all_gather(self, x: FpArray) -> FpArray:
        """local x[...] -> out[..., n] (every party's value, party-indexed
        trailing axis)."""
        limbs = jax.lax.all_gather(x.limbs, self.axis, axis=x.limbs.ndim,
                                   tiled=False)
        return FpArray(limbs)

    def broadcast_from(self, x: FpArray, src: int) -> FpArray:
        g = self.all_gather(x)
        return FpArray(g.limbs[..., src])


class HybridBackend:
    """n parties over D mesh devices, pp = n // D parties SIMULATED per
    device (global party id = device * pp + local — device-major, matching
    a contiguous shard of the global [n, ...] party axis). This is how a
    real deployment runs more parties than chips: local arrays carry a
    leading LOCAL party axis [pp, ...] and each collective composes ONE ICI
    all_to_all / all_gather with local transposes (the SimBackend moves).
    With D == n it degenerates to MeshBackend's layout; with D == 1 to
    SimBackend's."""

    def __init__(self, n: int, n_devices: int, axis_name: str = "parties"):
        assert n % n_devices == 0, (n, n_devices)
        self.n, self.ndev, self.pp = n, n_devices, n // n_devices
        self.axis = axis_name

    def my_ids(self):
        d = jax.lax.axis_index(self.axis)
        return d * self.pp + jnp.arange(self.pp, dtype=jnp.int32)

    def all_to_all(self, x: FpArray) -> FpArray:
        """local x[pp, ..., n] -> out[pp, ..., n] with the global-transpose
        contract out[g_j, ..., g_i] = in[g_i, ..., g_j]: one tiled ICI
        all_to_all on the last axis, then a local block transpose of the
        (local source party, local dst party) pair."""
        limbs = x.limbs                                # [L, pp, ..., n]
        nd = limbs.ndim
        y = jax.lax.all_to_all(limbs, self.axis, split_axis=nd - 1,
                               concat_axis=nd - 1, tiled=True)
        # y[L, a, ..., i*pp + b] = x_i[L, a, ..., d_self*pp + b]; the pair
        # (a = src local, b = dst local) still needs swapping
        shp = y.shape
        y = y.reshape(shp[:nd - 1] + (self.ndev, self.pp))
        y = jnp.swapaxes(y, 1, nd)                     # a <-> b
        return FpArray(y.reshape(shp))

    def all_gather(self, x: FpArray) -> FpArray:
        """local x[pp, ...] -> out[pp, ..., n]: every party's value on a
        trailing global-party axis, replicated to each local party."""
        limbs = x.limbs                                # [L, pp, ...]
        g = jax.lax.all_gather(limbs, self.axis, axis=0,
                               tiled=False)            # [D, L, pp, ...]
        nd = g.ndim
        g = jnp.moveaxis(g, (0, 2), (nd - 2, nd - 1))  # [L, ..., D, pp]
        g = g.reshape(g.shape[:-2] + (self.n,))
        out = jnp.broadcast_to(g[:, None],
                               (g.shape[0], self.pp) + g.shape[1:])
        return FpArray(out)

    def broadcast_from(self, x: FpArray, src: int) -> FpArray:
        g = self.all_gather(x)
        return FpArray(g.limbs[..., src])


class ByzantineBackend:
    """Byzantine fault injection at the network boundary: wraps any of the
    three backends and makes the listed parties corrupt EVERY value they
    contribute to a collective — the TPU-native form of the reference's
    send-time fault config (config.py:38-45 induce_faults consumed inside
    batch_reconstruction.py:129-131 / mpc.py:126-131). Honest parties'
    traffic is untouched; a corrupted party's wrong columns flow through
    the full open (R1 all_to_all + R2 all_gather) so the robust decoder's
    exclusion logic is exercised end to end, per open, inside a program.

    The perturbation is a distinct nonzero constant per collective call
    (trace-time counter — identical on every party, so the sharded program
    stays SPMD)."""

    def __init__(self, inner, fault_parties):
        self.inner = inner
        self.n = inner.n
        self.fault_parties = tuple(fault_parties)
        self._calls = 0

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def my_ids(self):
        return self.inner.my_ids()

    def _corrupt(self, x: FpArray) -> FpArray:
        if not self.fault_parties:
            return x
        ids = self.inner.my_ids()
        bad = jnp.zeros_like(ids, dtype=bool)
        for p in self.fault_parties:
            bad = bad | (ids == p)
        self._calls += 1
        delta = FpArray.from_int(0xB4D5EED + self._calls).broadcast_to(
            x.shape)
        wrong = x + delta
        if getattr(bad, "ndim", 0) == 0:            # MeshBackend: scalar id
            mask = jnp.broadcast_to(bad, x.shape)
        else:                                       # Sim/Hybrid: local axis
            mask = jnp.broadcast_to(
                bad.reshape(bad.shape + (1,) * (x.ndim - 1)), x.shape)
        return FpArray.select(mask, wrong, x)

    def all_to_all(self, x: FpArray) -> FpArray:
        return self.inner.all_to_all(self._corrupt(x))

    def all_gather(self, x: FpArray) -> FpArray:
        return self.inner.all_gather(self._corrupt(x))

    def broadcast_from(self, x: FpArray, src: int) -> FpArray:
        return self.inner.broadcast_from(self._corrupt(x), src)


def shard_over_parties(mesh: Mesh, fparr: FpArray) -> FpArray:
    """Device-put a global [n, ...] FpArray sharded on the party axis."""
    spec = P(None, "parties", *([None] * (fparr.ndim - 1)))
    return FpArray(jax.device_put(fparr.limbs, NamedSharding(mesh, spec)))
