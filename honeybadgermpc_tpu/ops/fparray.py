"""FpArray: a jit-friendly array of GF(p) elements in Montgomery form.

This is the device-side value type of the whole framework — the TPU-native
replacement for the reference's per-element ``GFElement`` objects
(honeybadgermpc/field.py:68) and NTL ``vec_ZZ_p``. Storage is
``uint32[L, *shape]`` (limbs leading, element axes minor — see ops/limbs.py
for why). Registered as a pytree so it flows through jit/vmap/shard_map.

All arithmetic stays in Montgomery form; conversion happens only at the
host boundary (``from_ints`` / ``to_ints``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import montgomery as mont
from .limbs import (L, P, R2_MOD_P_LIMBS, R_MOD_P_LIMBS, ints_to_limbs,
                    limbs_to_ints)


def _as_list(limbs):
    return [limbs[j] for j in range(L)]


def _as_stack(lst):
    return jnp.stack(lst, axis=0)


# Jitted kernel entry points over stacked limbs. Calling through these (rather
# than tracing op-by-op in eager mode) matters: one Montgomery multiply is
# ~300 uint32 ops, so eager dispatch would dominate. Under an outer jit
# these nested jits are inlined and fuse normally.
_jit_add = jax.jit(mont.add_mod)
_jit_sub = jax.jit(mont.sub_mod)
_jit_mul = jax.jit(mont.mont_mul)
_jit_sqr = jax.jit(mont.mont_sqr)
_jit_neg = jax.jit(mont.neg_mod)
_jit_inv = jax.jit(mont.inv_mod)
_jit_to_mont = jax.jit(mont.to_mont)
_jit_redc384 = jax.jit(mont.redc384)
_jit_from_mont = jax.jit(mont.from_mont)
_jit_sqrt = jax.jit(mont.sqrt_mod)
_jit_pow = jax.jit(mont.pow_const, static_argnums=1)
_jit_is_zero = jax.jit(mont.is_zero_mask)
_jit_eq = jax.jit(mont.eq_mask)


@jax.tree_util.register_pytree_node_class
class FpArray:
    """Array of field elements; shape excludes the limb axis."""

    __slots__ = ("limbs",)

    def __init__(self, limbs):
        self.limbs = limbs  # uint32[L, *shape], Montgomery form, canonical

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.limbs,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # -- construction ------------------------------------------------------
    @classmethod
    def from_ints(cls, xs):
        """Host: Python ints / object array -> Montgomery-form FpArray."""
        arr = np.asarray(xs, dtype=object)
        if arr.ndim == 0:
            plain = ints_to_limbs(np.array(int(arr[()]) % P, dtype=object))
        else:
            plain = ints_to_limbs(
                np.vectorize(lambda v: int(v) % P, otypes=[object])(arr))
        return cls(_jit_to_mont(jnp.asarray(plain)))

    @classmethod
    def from_int(cls, x: int, shape=()):
        v = pow(2, 256, P) * x % P  # Montgomery form computed on host
        host = ints_to_limbs(np.full(shape, v, dtype=object)) if shape else ints_to_limbs(np.array(v, dtype=object))
        return cls(jnp.asarray(host))

    @classmethod
    def zeros(cls, shape=()):
        return cls.from_int(0, shape)

    @classmethod
    def ones(cls, shape=()):
        return cls.from_int(1, shape)

    @classmethod
    def from_limbs_plain(cls, limbs):
        """Device: uint32[L, *shape] plain residues (any 256-bit value) ->
        Montgomery FpArray, reducing mod p."""
        return cls(_jit_to_mont(limbs))

    @classmethod
    def rand(cls, key, shape=()):
        """Uniform field elements, statistical distance < 2^-129 from
        uniform: a 384-bit draw sent through a standalone 9-round
        Montgomery reduction (ops/montgomery.py::redc384). The canonical
        output limbs are used DIRECTLY as the Montgomery representation —
        the represented value is T*2^-400 mod p, a fixed bijection of the
        uniform draw, so no to-Montgomery conversion is needed (that
        mont_mul was ~4x the PRNG's own cost in the offline programs).
        Draws full 32-bit words and splits them into 16-bit limbs.

        On TPU at batch >= 1024 the whole pipeline (Threefry PRF + the
        reduction) runs as one register-resident Pallas kernel whose only
        HBM traffic is the output (ops/pallas_field.py::rand_limbs_pallas);
        the two paths draw from different counter layouts, so the same key
        yields different (equally uniform) values on CPU vs TPU."""
        shape = tuple(shape)
        numel = 1
        for d in shape:
            numel *= d
        if numel and mont._use_pallas(numel):
            from .pallas_field import rand_limbs_pallas
            kd = jnp.asarray(key)
            if jnp.issubdtype(kd.dtype, jax.dtypes.prng_key):
                kd = jax.random.key_data(key)
            limbs = rand_limbs_pallas(kd.astype(jnp.uint32).reshape(2),
                                      numel)
            return cls(limbs.reshape((L,) + shape))
        words = jax.random.bits(key, (mont.RAND_LIMBS // 2,) + tuple(shape),
                                dtype=jnp.uint32)
        bits = jnp.stack([words & jnp.uint32(0xFFFF), words >> 16],
                         axis=1).reshape((mont.RAND_LIMBS,) + tuple(shape))
        return cls(_jit_redc384(bits))

    # -- host extraction ---------------------------------------------------
    def to_ints(self) -> np.ndarray:
        """Object ndarray of Python ints in [0, p)."""
        plain = _jit_from_mont(self.limbs)
        return limbs_to_ints(np.asarray(jax.device_get(plain)))

    def to_int(self) -> int:
        assert self.shape == (), self.shape
        return int(self.to_ints()[()])

    # -- shape plumbing ----------------------------------------------------
    @property
    def shape(self):
        return tuple(self.limbs.shape[1:])

    @property
    def ndim(self):
        return self.limbs.ndim - 1

    @property
    def size(self):
        s = 1
        for d in self.shape:
            s *= d
        return s

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return FpArray(self.limbs.reshape((L,) + tuple(shape)))

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return FpArray(self.limbs[(slice(None),) + idx])

    def at_set(self, idx, value: "FpArray"):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return FpArray(self.limbs.at[(slice(None),) + idx].set(value.limbs))

    def transpose(self, axes=None):
        if axes is None:
            axes = tuple(reversed(range(self.ndim)))
        return FpArray(self.limbs.transpose((0,) + tuple(a + 1 for a in axes)))

    @property
    def T(self):
        return self.transpose()

    def broadcast_to(self, shape):
        shape = tuple(shape)
        limbs = self.limbs
        if self.ndim < len(shape):
            limbs = limbs.reshape(
                (L,) + (1,) * (len(shape) - self.ndim) + self.shape)
        return FpArray(jnp.broadcast_to(limbs, (L,) + shape))

    def take(self, indices, axis=0):
        indices = jnp.asarray(indices)
        return FpArray(jnp.take(self.limbs, indices, axis=axis + 1))

    @staticmethod
    def concatenate(arrays, axis=0):
        return FpArray(jnp.concatenate([a.limbs for a in arrays], axis=axis + 1))

    @staticmethod
    def stack(arrays, axis=0):
        return FpArray(jnp.stack([a.limbs for a in arrays], axis=axis + 1))

    def _lst(self):
        return _as_list(self.limbs)

    # -- arithmetic --------------------------------------------------------
    def _coerce(self, other):
        if isinstance(other, FpArray):
            return other
        if isinstance(other, int):
            return FpArray.from_int(other)
        return NotImplemented

    def __add__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        return FpArray(_jit_add(self.limbs, o.limbs))

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        return FpArray(_jit_sub(self.limbs, o.limbs))

    def __rsub__(self, other):
        o = self._coerce(other)
        return FpArray(_jit_sub(o.limbs, self.limbs))

    def __mul__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        return FpArray(_jit_mul(self.limbs, o.limbs))

    __rmul__ = __mul__

    def __neg__(self):
        return FpArray(_jit_neg(self.limbs))

    def __truediv__(self, other):
        o = self._coerce(other)
        return self * o.inv()

    def __rtruediv__(self, other):
        o = self._coerce(other)
        return o * self.inv()

    def square(self):
        return FpArray(_jit_sqr(self.limbs))

    def inv(self):
        """Elementwise inverse (Fermat; inv(0)=0)."""
        return FpArray(_jit_inv(self.limbs))

    def pow_static(self, e: int):
        return FpArray(_jit_pow(self.limbs, e))

    def sqrt(self):
        r, ok = _jit_sqrt(self.limbs)
        return FpArray(r), ok

    # -- predicates --------------------------------------------------------
    def is_zero(self):
        return _jit_is_zero(self.limbs)

    def eq(self, other):
        o = self._coerce(other)
        return _jit_eq(self.limbs, o.limbs)

    @staticmethod
    def select(mask, a: "FpArray", b: "FpArray"):
        """where(mask, a, b) — mask broadcasts over element shape."""
        return FpArray(jnp.where(mask[None, ...], a.limbs, b.limbs))

    def __repr__(self):
        if self.limbs.ndim and not isinstance(self.limbs, jax.core.Tracer) and self.size <= 8:
            try:
                return f"FpArray({self.to_ints()!r})"
            except Exception:
                pass
        return f"FpArray(shape={self.shape}, mont_limbs={self.limbs.shape})"
