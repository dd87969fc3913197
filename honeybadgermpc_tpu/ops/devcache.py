"""Device-resident constant cache.

Host-precomputed Montgomery matrices (Vandermonde, Lagrange, FNT step-1
tables) are cached as numpy to avoid tracer leaks — but converting them
with jnp.asarray on every EAGER call re-uploads megabytes through the
device transport each time. This helper caches the device copy keyed by
the numpy array's identity, only when no trace is active (inside a trace,
jnp.asarray stages the constant into the jaxpr, which is already right).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CACHE: dict = {}


def _tracing() -> bool:
    try:
        from jax._src import core as _core
        return not _core.trace_state_clean()
    except Exception:
        # cannot tell -> assume tracing (never cache a possible tracer)
        return True


def dev_const(np_arr):
    """numpy array -> device array, cached across eager calls."""
    if _tracing():
        return jnp.asarray(np_arr)
    key = id(np_arr)
    hit = _CACHE.get(key)
    if hit is None:
        hit = jax.device_put(np_arr)
        _CACHE[key] = hit
    return hit
