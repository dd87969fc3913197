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


def shard_over_parties(mesh: Mesh, fparr: FpArray) -> FpArray:
    """Device-put a global [n, ...] FpArray sharded on the party axis."""
    spec = P(None, "parties", *([None] * (fparr.ndim - 1)))
    return FpArray(jax.device_put(fparr.limbs, NamedSharding(mesh, spec)))
