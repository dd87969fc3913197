"""Trusted-dealer preprocessing, device-accelerated.

TPU redesign of the reference's PreProcessedElements
(honeybadgermpc/preprocessing.py: mixin ABC :39, generation via
vandermonde_batch_evaluate :211-239, kinds :299-496, facade :498-669).
Instead of writing per-party share FILES, the dealer generates whole share
tensors [n, count] on device (dealing = one batched encode — exactly the
reference's generation kernel, minus the file round-trip) and the runtime
consumes them cursor-style. ``save``/``load`` provide the file-backed
variant for cross-process runs (sharedata/ parity).

Kinds (reference names preserved): triples, cubes, zeros, rands, bits,
one_minus_ones, double_shares, share_bits, powers, share.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fparray import FpArray
from ..ops.limbs import P
from ..ops.rs import Encoding


from functools import lru_cache


def _share_pure(enc: Encoding, degree: int, values: FpArray, key) -> FpArray:
    """values[B] -> shares[n, B] (pure; traceable)."""
    B = values.shape[-1]
    hi = FpArray.rand(key, (B, degree))
    coeffs = FpArray.concatenate([values.reshape(B, 1), hi], axis=1)
    return enc.encode(coeffs).transpose((1, 0))


@lru_cache(maxsize=None)
def _dealer_jit(n: int, t: int, k: int, kind: str, omega: bool):
    """One jitted device program per (params, kind): the whole dealer
    generation (random draws + products + share encodes) runs as a single
    dispatch instead of an eager op chain."""
    enc = Encoding(n, use_omega_powers=omega)

    def run(key):
        ks = jax.random.split(key, 4)
        if kind == "triples":
            a = FpArray.rand(ks[0], (k,))
            b = FpArray.rand(ks[1], (k,))
            ab = a * b
            return FpArray.stack(
                [_share_pure(enc, t, a, ks[2]),
                 _share_pure(enc, t, b, ks[3]),
                 _share_pure(enc, t, ab,
                             jax.random.fold_in(key, 7))], axis=2).limbs
        if kind == "cubes":
            r = FpArray.rand(ks[0], (k,))
            r2 = r * r
            r3 = r2 * r
            return FpArray.stack(
                [_share_pure(enc, t, r, ks[1]),
                 _share_pure(enc, t, r2, ks[2]),
                 _share_pure(enc, t, r3, ks[3])], axis=2).limbs
        if kind == "rands":
            r = FpArray.rand(ks[0], (k,))
            return _share_pure(enc, t, r, ks[1]).reshape(n, k, 1).limbs
        if kind == "double_shares":
            r = FpArray.rand(ks[0], (k,))
            return FpArray.stack(
                [_share_pure(enc, t, r, ks[1]),
                 _share_pure(enc, 2 * t, r, ks[2])], axis=2).limbs
        raise ValueError(kind)

    return jax.jit(run)


class _Pool:
    """A consumable pool of dealt share tensors, each [n, capacity, ...].

    Stored as a LIST of segments: concatenating into one growing tensor
    would change the array shape on every put, forcing a fresh XLA
    compile per dealer call (multi-second on a remote-compile backend).
    take() slices within a segment when possible; cross-segment takes
    concatenate just the needed parts (shape = k, cached compile)."""

    def __init__(self):
        self.segs: list[FpArray] = []
        self.cursor = 0                    # offset into segs[0]

    def put(self, arr: FpArray):
        self.segs.append(arr)

    def take(self, k: int) -> FpArray:
        assert self.remaining() >= k, \
            f"preprocessing pool exhausted (have {self.remaining()}, want {k})"
        parts = []
        need = k
        while need:
            seg = self.segs[0]
            avail = seg.shape[1] - self.cursor
            use = min(avail, need)
            # dynamic_slice with a DEVICE offset: the compiled slice is
            # offset-generic, so consuming cursor-style doesn't trigger a
            # fresh XLA compile per take (baked static offsets would)
            parts.append(FpArray(jax.lax.dynamic_slice_in_dim(
                seg.limbs, jnp.int32(self.cursor), use, axis=2)))
            need -= use
            self.cursor += use
            if self.cursor == seg.shape[1]:
                self.segs.pop(0)
                self.cursor = 0
        if len(parts) == 1:
            return parts[0]
        return FpArray.concatenate(parts, axis=1)

    @property
    def data(self) -> FpArray | None:
        """All remaining elements as one tensor (save()/inspection path)."""
        if not self.segs:
            return None
        if self.cursor:
            seg = self.segs[0]
            self.segs[0] = FpArray(jax.lax.dynamic_slice_in_dim(
                seg.limbs, jnp.int32(self.cursor),
                seg.shape[1] - self.cursor, axis=2))
            self.cursor = 0
        if len(self.segs) > 1:
            self.segs = [FpArray.concatenate(self.segs, axis=1)]
        return self.segs[0]

    @data.setter
    def data(self, arr):
        self.segs = [arr] if arr is not None else []
        self.cursor = 0

    def remaining(self):
        return sum(s.shape[1] for s in self.segs) - self.cursor


class PreProcessedElements:
    """Dealer for (n, t); all kinds share one PRNG stream (seeded, so runs
    are reproducible like the reference's seeded dealer files)."""

    def __init__(self, n: int, t: int, seed: int = 0,
                 use_omega_powers: bool = False):
        self.n, self.t = n, t
        self.enc = Encoding(n, use_omega_powers=use_omega_powers)
        self._key = jax.random.PRNGKey(seed)
        self._pools: dict[str, _Pool] = {}

    def _next_key(self, num=1):
        self._key, *ks = jax.random.split(self._key, num + 1)
        return ks if num > 1 else ks[0]

    def _pool(self, kind: str) -> _Pool:
        return self._pools.setdefault(kind, _Pool())

    # -- dealing kernels ---------------------------------------------------
    def _share_values(self, values: FpArray, degree: int | None = None) -> FpArray:
        """values[B] -> shares[n, B] via random degree-t polys (the
        reference's generation loop, preprocessing.py:211-239, as one
        batched encode)."""
        degree = self.t if degree is None else degree
        B = values.shape[-1]
        key = self._next_key()
        hi = FpArray.rand(key, (B, degree))
        coeffs = FpArray.concatenate([values.reshape(B, 1), hi], axis=1)
        return self.enc.encode(coeffs).transpose((1, 0))      # [n, B]

    # -- generators (reference generate_* API) -----------------------------
    def _run_dealer(self, kind: str, k: int):
        run = _dealer_jit(self.n, self.t, k, kind,
                          self.enc.use_omega_powers)
        return FpArray(run(self._next_key()))

    def generate_triples(self, k: int):
        self._pool("triples").put(self._run_dealer("triples", k))

    def generate_cubes(self, k: int):
        self._pool("cubes").put(self._run_dealer("cubes", k))

    def generate_rands(self, k: int):
        self._pool("rands").put(self._run_dealer("rands", k))

    def generate_zeros(self, k: int):
        z = FpArray.zeros((k,))
        self._pool("zeros").put(self._share_values(z).reshape(self.n, k, 1))

    def generate_bits(self, k: int):
        bits = jax.random.bernoulli(self._next_key(), shape=(k,))
        b = FpArray.select(bits, FpArray.ones((k,)).broadcast_to((k,)),
                           FpArray.zeros((k,)).broadcast_to((k,)))
        self._pool("bits").put(self._share_values(b).reshape(self.n, k, 1))

    def generate_one_minus_ones(self, k: int):
        bits = jax.random.bernoulli(self._next_key(), shape=(k,))
        pm = FpArray.select(bits, FpArray.ones((k,)).broadcast_to((k,)),
                            FpArray.from_int(P - 1, (k,)))
        self._pool("one_minus_ones").put(
            self._share_values(pm).reshape(self.n, k, 1))

    def generate_double_shares(self, k: int):
        """(r_t, r_2t) pairs (preprocessing.py:330)."""
        self._pool("double_shares").put(
            self._run_dealer("double_shares", k))

    def generate_share_bits(self, k: int, bit_length: int = 255):
        """r plus its bit decomposition (preprocessing.py:299: stride 255+1)."""
        import random as _r
        rng = _r.Random(int(jax.random.randint(
            self._next_key(), (), 0, 2**31 - 1)))
        rs = [rng.randrange(P) for _ in range(k)]
        cols = []
        for r in rs:
            cols.append([r] + [(r >> i) & 1 for i in range(bit_length)])
        vals = FpArray.from_ints(cols)                         # [k, 1+bits]
        flat = vals.reshape(k * (bit_length + 1))
        sh = self._share_values(flat).reshape(self.n, k, bit_length + 1)
        self._pool("share_bits").put(sh)

    def generate_powers(self, x_count: int, k: int):
        """x_count independent x's, each with powers x^1..x^k
        (preprocessing.py:350)."""
        x = FpArray.rand(self._next_key(), (x_count,))
        pows = [x]
        for _ in range(k - 1):
            pows.append(pows[-1] * x)
        stacked = FpArray.stack(pows, axis=1).reshape(x_count * k)
        sh = self._share_values(stacked).reshape(self.n, x_count, k)
        self._pool("powers").put(sh)

    def generate_share(self, value: int, degree: int | None = None):
        v = FpArray.from_ints([value])
        sh = self._share_values(v, degree).reshape(self.n, 1, 1)
        self._pool(f"share_d{degree or self.t}").put(sh)

    # -- consumers (get_* API; shapes [n, k, parts]) ------------------------
    def get_triples(self, k: int):
        s = self._pool("triples").take(k)
        return (FpArray(s.limbs[..., 0]), FpArray(s.limbs[..., 1]),
                FpArray(s.limbs[..., 2]))

    def get_cubes(self, k: int):
        s = self._pool("cubes").take(k)
        return (FpArray(s.limbs[..., 0]), FpArray(s.limbs[..., 1]),
                FpArray(s.limbs[..., 2]))

    def get_rands(self, k: int):
        return FpArray(self._pool("rands").take(k).limbs[..., 0])

    def get_zeros(self, k: int):
        return FpArray(self._pool("zeros").take(k).limbs[..., 0])

    def get_bits(self, k: int):
        return FpArray(self._pool("bits").take(k).limbs[..., 0])

    def get_one_minus_ones(self, k: int):
        return FpArray(self._pool("one_minus_ones").take(k).limbs[..., 0])

    def get_double_shares(self, k: int):
        s = self._pool("double_shares").take(k)
        return FpArray(s.limbs[..., 0]), FpArray(s.limbs[..., 1])

    def get_share_bits(self, k: int):
        s = self._pool("share_bits").take(k)
        return FpArray(s.limbs[..., 0]), FpArray(s.limbs[..., 1:])

    def get_powers(self, k: int):
        return self._pool("powers").take(k)

    def get_share(self, degree: int | None = None):
        return FpArray(self._pool(f"share_d{degree or self.t}").take(1).limbs[..., 0, 0])

    # -- persistence (sharedata/ parity) ------------------------------------
    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        for kind, pool in self._pools.items():
            if pool.data is None:
                continue
            np.save(os.path.join(path, f"{kind}_{self.n}_{self.t}.npy"),
                    np.asarray(jax.device_get(pool.data.limbs)))
            with open(os.path.join(path, f"{kind}_{self.n}_{self.t}.meta"), "wb") as f:
                pickle.dump({"cursor": pool.cursor}, f)

    def load(self, path: str):
        import glob
        for fn in glob.glob(os.path.join(path, f"*_{self.n}_{self.t}.npy")):
            kind = os.path.basename(fn).rsplit(f"_{self.n}_{self.t}.npy", 1)[0]
            pool = self._pool(kind)
            pool.data = FpArray(jnp.asarray(np.load(fn)))
            meta = fn[:-4] + ".meta"
            if os.path.exists(meta):
                with open(meta, "rb") as f:
                    pool.cursor = pickle.load(f)["cursor"]


# -- cross-process READY barrier (preprocessing.py:585-595 parity) ----------
_READY_FILE = "READY"


def preprocessing_done(path: str = "sharedata"):
    """Signal that dealer preprocessing under ``path`` is complete."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _READY_FILE), "w") as f:
        f.write("ready")


def wait_for_preprocessing(path: str = "sharedata", timeout: float = 60.0,
                           poll: float = 0.2):
    """Block until the dealer drops the READY file under ``path``."""
    import time
    deadline = time.monotonic() + timeout
    ready = os.path.join(path, _READY_FILE)
    while not os.path.exists(ready):
        if time.monotonic() >= deadline:
            raise TimeoutError(f"preprocessing READY barrier: {ready}")
        time.sleep(poll)
