"""The MPC runtime context and dataflow types.

TPU redesign of the reference's Mpc context (honeybadgermpc/mpc.py:25-306)
and the Viff-style dataflow layer (progs/mixins/dataflow.py). The asyncio
future graph becomes synchronous batched dataflow: a ``ShareArray`` holds a
whole tensor of shares, linear algebra is local FpArray math, and every
nonlinear op lowers to a batched open (one or two mesh collectives).
Mixin-style op injection is preserved (mpc.py:84-99): nonlinear ops
dispatch through a name->callable config so protocols can swap Beaver vs
double-sharing multiplication etc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fparray import FpArray
from ..ops.limbs import P
from ..parallel.mesh import HybridBackend, SimBackend
from ..parallel.reconstruct import batch_reconstruct
from .preprocessing import PreProcessedElements


class MixinConstants:
    MultiplyShareArray = "multiply_share_array"
    InvertShareArray = "invert_share_array"
    DivideShareArrays = "divide_share_arrays"
    ShareEquality = "share_equality"
    ShareLessThan = "share_less_than"


class ShareArray:
    """A tensor of degree-t Shamir shares bound to a context.

    Linear operations are local (dataflow.py:85-117); ``*`` and ``/``
    between ShareArrays dispatch through the context's mixin config
    (dataflow.py:119-171). Values shape: [B] per party (SimBackend carries
    the leading party axis internally)."""

    __slots__ = ("ctx", "v", "t")

    def __init__(self, ctx: "MpcContext", v: FpArray, t: int | None = None):
        self.ctx = ctx
        self.v = v
        self.t = ctx.t if t is None else t

    @property
    def shape(self):
        return self.v.shape[self.ctx.lead:]

    def _like(self, v, t=None):
        return ShareArray(self.ctx, v, self.t if t is None else t)

    def _coerce_public(self, other):
        if isinstance(other, int):
            return FpArray.from_int(other)
        if isinstance(other, FpArray):
            return other
        return None

    def _check_ctx(self, other):
        """Shares from different contexts must never combine (reference
        dataflow.py typechecks bind ops to one per-context Share type;
        tests/progs/mixins test_cant_multiply_shares_from_different_contexts)."""
        if other.ctx is not self.ctx:
            raise TypeError("cannot combine shares from different contexts")

    # -- linear (local) ----------------------------------------------------
    def __add__(self, other):
        if isinstance(other, ShareArray):
            self._check_ctx(other)
            assert self.t == other.t, "degree mismatch"
            return self._like(self.v + other.v)
        pub = self._coerce_public(other)
        return self._like(self.v + pub)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, ShareArray):
            self._check_ctx(other)
            assert self.t == other.t
            return self._like(self.v - other.v)
        return self._like(self.v - self._coerce_public(other))

    def __rsub__(self, other):
        return self._like(self._coerce_public(other) - self.v)

    def __neg__(self):
        return self._like(-self.v)

    def __mul__(self, other):
        if isinstance(other, ShareArray):
            self._check_ctx(other)
            return self.ctx.call_mixin(MixinConstants.MultiplyShareArray,
                                       self, other)
        return self._like(self.v * self._coerce_public(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, ShareArray):
            self._check_ctx(other)
            return self.ctx.call_mixin(MixinConstants.DivideShareArrays,
                                       self, other)
        pub = self._coerce_public(other)
        return self._like(self.v * pub.inv())

    def __eq__(self, other):  # secure equality test -> shares of 0/1
        if isinstance(other, ShareArray):
            self._check_ctx(other)
        return self.ctx.call_mixin(MixinConstants.ShareEquality, self, other)

    def __lt__(self, other):
        if isinstance(other, ShareArray):
            self._check_ctx(other)
        return self.ctx.call_mixin(MixinConstants.ShareLessThan, self, other)

    __hash__ = None

    # -- nonlinear ---------------------------------------------------------
    def open(self) -> FpArray:
        """Batch-open: all parties learn the values (dataflow.py:197 ->
        mpc.py open_share_array :164 -> batch_reconstruct)."""
        return self.ctx.open_share_array(self)

    def square(self):
        return self * self

    def local_mul(self, other: "ShareArray") -> "ShareArray":
        """Degree-doubling local product (DoubleSharingMultiply front half,
        share_arithmetic.py:48-68)."""
        self._check_ctx(other)
        return ShareArray(self.ctx, self.v * other.v, self.t + other.t)

    def invert(self):
        return self.ctx.call_mixin(MixinConstants.InvertShareArray, self)

    def take(self, idx, axis=0):
        off = self.ctx.lead
        return self._like(self.v.take(idx, axis=axis + off))

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        lead = self.v.shape[:self.ctx.lead]
        return self._like(self.v.reshape(lead + shape))

    @staticmethod
    def concat(arrays, axis=0):
        ctx = arrays[0].ctx
        off = ctx.lead
        t = arrays[0].t
        assert all(a.t == t for a in arrays)
        return ShareArray(ctx, FpArray.concatenate(
            [a.v for a in arrays], axis=axis + off), t)

    def tree_fold(self, op):
        """Log-depth commutative reduce over the (1-D) element axis
        (reference dataflow.py:237-279 ``_tree_fold``): each level pairs
        even/odd elements and applies ``op`` as ONE batched ShareArray op
        (so a nonlinear op costs one open per level, log2(k) total),
        carrying an unpaired tail element to the next level. Returns a
        scalar ``Share``."""
        assert len(self.shape) == 1 and self.shape[0] > 0
        arr, k = self, self.shape[0]
        while k > 1:
            half = k // 2
            idx = np.arange(half)
            left = arr.take(idx * 2, axis=0)
            right = arr.take(idx * 2 + 1, axis=0)
            res = op(left, right)
            if k % 2:
                res = ShareArray.concat([res, arr.take([k - 1], axis=0)],
                                        axis=0)
            arr, k = res, half + (k % 2)
        return Share(arr)

    def multiplicative_product(self):
        """Product of all elements in log2(k) rounds of one batched Beaver
        multiply each (reference dataflow.py:281-287). Empty array folds to
        the constant-1 share (every party holds 1: the degree-0 sharing)."""
        numel = 1
        for d in self.shape:
            numel *= d
        if numel == 0:
            if len(self.shape) != 1:
                raise ValueError(
                    f"multiplicative_product needs a 1-D ShareArray; got "
                    f"empty shape {self.shape}")
            lead = self.v.shape[:self.ctx.lead]
            return Share(self._like(FpArray.ones(lead + (1,))))
        return self.tree_fold(ShareArray.__mul__)


class Share:
    """A single degree-t Shamir share (reference dataflow.py:50 Share):
    scalar operator surface over a one-element ShareArray. Linear ops are
    local; ``*``, ``/``, ``==``, ``<`` dispatch through the context mixins;
    ``open()`` reveals the value (dataflow.py:65-171). The reference's
    ShareFuture/GFElementFuture have no analog — the batched synchronous
    runtime returns values directly (SURVEY §7 design stance)."""

    __slots__ = ("_arr",)

    def __init__(self, arr: ShareArray):
        assert arr.shape == (1,), arr.shape
        self._arr = arr

    @property
    def ctx(self):
        return self._arr.ctx

    @property
    def t(self):
        return self._arr.t

    def _wrap(self, out):
        return Share(out) if isinstance(out, ShareArray) else out

    def _unlift(self, other):
        return other._arr if isinstance(other, Share) else other

    def __add__(self, other):
        return self._wrap(self._arr + self._unlift(other))

    __radd__ = __add__

    def __sub__(self, other):
        return self._wrap(self._arr - self._unlift(other))

    def __rsub__(self, other):
        return self._wrap(self._unlift(other) - self._arr)

    def __neg__(self):
        return self._wrap(-self._arr)

    def __mul__(self, other):
        return self._wrap(self._arr * self._unlift(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._wrap(self._arr / self._unlift(other))

    def __eq__(self, other):
        return self._wrap(self._arr == self._unlift(other))

    def __lt__(self, other):
        return self._wrap(self._arr < self._unlift(other))

    __hash__ = None

    def invert(self):
        return self._wrap(self._arr.invert())

    def square(self):
        return self._wrap(self._arr.square())

    def open(self) -> int:
        """Open this single share: all parties learn the value
        (dataflow.py:65-82 -> mpc.py open_share :101). All honest parties
        agree, so return one int (sim: party 0's view)."""
        vals = self._arr.open().to_ints()
        flat = np.asarray(vals, dtype=object).reshape(-1)
        return int(flat[0])


# ----------------------------------------------------------------------------

def beaver_multiply_arrays(ctx: "MpcContext", x: ShareArray, y: ShareArray):
    """share_arithmetic.py:24 BeaverMultiplyArrays: one parallel open of
    (x-a, y-b); xy = de + db + ea + ab. Arbitrary element shapes: the
    element axes are flattened against the triple pool and restored."""
    xf, shape = _flatten_elements(ctx, x)
    yf, _ = _flatten_elements(ctx, y)
    k = xf.v.shape[-1]
    a, b, ab = ctx.preproc_triples(k, xf)
    both = ShareArray.concat([xf - a, yf - b], axis=x_last_axis(ctx, xf))
    opened = ctx.open_share_array(both)
    d, e = _split2(ctx, opened, k)
    d, e = FpArray(d), FpArray(e)
    out = ShareArray(ctx, d * e + d * b.v + e * a.v + ab.v, x.t)
    return _unflatten_elements(ctx, out, shape)


def invert_share_array(ctx: "MpcContext", x: ShareArray):
    """share_arithmetic.py:120 InvertShareArray: open r*x, return r/(rx)."""
    xf, shape = _flatten_elements(ctx, x)
    k = xf.v.shape[-1]
    r = ctx.preproc_rands(k, xf)
    rx = ctx.open_share_array(beaver_multiply_arrays(ctx, r, xf))
    out = ShareArray(ctx, r.v * rx.inv(), x.t)
    return _unflatten_elements(ctx, out, shape)


def divide_share_arrays(ctx: "MpcContext", x: ShareArray, y: ShareArray):
    return beaver_multiply_arrays(ctx, x, invert_share_array(ctx, y))


def double_sharing_multiply_arrays(ctx: "MpcContext", x: ShareArray,
                                   y: ShareArray):
    """share_arithmetic.py:71 DoubleSharingMultiplyArrays — the reference's
    second multiplication strategy: local degree-2t product, masked with a
    preprocessed double sharing (r_t, r_2t), ONE open at degree 2t, unmask:

        d = open(x*y - r_2t);   xy_t = r_t + d

    One round instead of Beaver's open-then-combine two-trip (it consumes
    double_shares instead of triples). Select it via
    ``mixins={MixinConstants.MultiplyShareArray:
    double_sharing_multiply_arrays}`` (the reference's config injection,
    mpc.py:84-99)."""
    xf, shape = _flatten_elements(ctx, x)
    yf, _ = _flatten_elements(ctx, y)
    k = xf.v.shape[-1]
    r_t, r_2t = ctx.preproc_double_shares(k, xf)
    z = xf.local_mul(yf)                            # degree-2t share of xy
    d = ctx.open_double_share_array(
        ShareArray(ctx, z.v - r_2t.v, 2 * ctx.t))
    out = ShareArray(ctx, r_t.v + d, x.t)
    return _unflatten_elements(ctx, out, shape)


def _flatten_elements(ctx, x: ShareArray):
    """[party?, *S] -> ([party?, prod(S)], S)."""
    lead = x.v.shape[:ctx.lead]
    shape = x.v.shape[ctx.lead:]
    total = 1
    for d in shape:
        total *= d
    if len(shape) == 1:
        return x, shape
    return ShareArray(ctx, x.v.reshape(lead + (total,)), x.t), shape


def _unflatten_elements(ctx, x: ShareArray, shape):
    if len(shape) == 1:
        return x
    lead = x.v.shape[:ctx.lead]
    return ShareArray(ctx, x.v.reshape(lead + tuple(shape)), x.t)


def x_last_axis(ctx, x: ShareArray):
    return x.v.ndim - 1 - ctx.lead


def _numel(ctx, x: ShareArray):
    return x.v.shape[-1]


def _split2(ctx, opened: FpArray, k: int):
    return opened.limbs[..., :k], opened.limbs[..., k:]


DEFAULT_MIXINS = {
    MixinConstants.MultiplyShareArray: beaver_multiply_arrays,
    MixinConstants.InvertShareArray: invert_share_array,
    MixinConstants.DivideShareArrays: divide_share_arrays,
}


def _assert_party_agreement(secrets: FpArray):
    """Sim-open blind-spot closer: every simulated party decodes the open
    independently, so a per-party decode divergence bug would otherwise be
    invisible to tests that read party 0's view (the reference's honest
    parties agree by protocol; mpc.py:262-264 asserts redundancy). Eager
    sim opens only; skipped under trace and via HBMPC_NO_AGREEMENT_CHECK."""
    import os

    import jax.core
    if os.environ.get("HBMPC_NO_AGREEMENT_CHECK"):
        return
    if isinstance(secrets.limbs, jax.core.Tracer):
        return
    lim = secrets.limbs                      # [L, n, ...]
    ok = bool(jax.device_get(jnp.all(lim == lim[:, :1])))
    assert ok, "sim open: per-party decoded values diverged"


class MpcContext:
    """n-party MPC context over a backend (mpc.py:26 Mpc).

    sim=True: backend is SimBackend, share tensors carry a leading party
    axis and this one context computes all parties at once (the
    TaskProgramRunner model, mpc.py:280). sim=False: the context runs
    per-party inside shard_map (ProcessProgramRunner model, ipc.py:117)."""

    field_modulus = P

    def __init__(self, n: int, t: int, backend=None,
                 preproc: PreProcessedElements | None = None,
                 use_omega_powers: bool = False, mixins=None,
                 robust: bool = True):
        self.n, self.t = n, t
        self.backend = backend or SimBackend(n)
        # layout classification looks through fault-injection wrappers
        # (ByzantineBackend delegates to .inner)
        base = getattr(self.backend, "inner", self.backend)
        self.sim = isinstance(base, SimBackend)
        # number of leading LOCAL party axes on share tensors: SimBackend
        # carries all n parties ([n, ...]), HybridBackend its per-device
        # slice ([pp, ...]); MeshBackend (one party per device inside
        # shard_map) carries none
        self.lead = 1 if isinstance(base, (SimBackend, HybridBackend)) else 0
        self.preproc = preproc
        self.use_omega_powers = use_omega_powers
        self.robust = robust
        self.config = dict(DEFAULT_MIXINS)
        if mixins:
            self.config.update(mixins)
        self.opened_count = 0
        # per-local-party corrected-error tally, summed over every open in
        # the program (reference batch_reconstruction.py surfaces the same
        # count per reconstruction; here it is a traced value a program can
        # return — see make_sharded_mpc_program(return_nerr=True))
        self.nerr_total = jnp.int32(0)

    @property
    def local_parties(self) -> int:
        """Size of the leading local party axis (sim: n; hybrid: n/D;
        mesh: 0 — no local axis)."""
        base = getattr(self.backend, "inner", self.backend)
        if isinstance(base, SimBackend):
            return self.n
        if isinstance(base, HybridBackend):
            return base.pp
        return 0

    def lift_public(self, pub: FpArray) -> FpArray:
        """Public values -> every local party's constant view (adds the
        leading local party axis when the backend carries one)."""
        if not self.lead:
            return pub
        limbs = jnp.broadcast_to(
            pub.limbs[:, None, ...],
            pub.limbs.shape[:1] + (self.local_parties,) + pub.limbs.shape[1:])
        return FpArray(limbs)

    # -- construction ------------------------------------------------------
    def ShareArray(self, v: FpArray, t: int | None = None) -> ShareArray:
        return ShareArray(self, v, t)

    def Share(self, v, t: int | None = None) -> Share:
        """Scalar share (reference mpc.py:69-74 per-context Share type).
        v: a one-element ShareArray, or a dealt [n, 1]/[1] FpArray."""
        if isinstance(v, ShareArray):
            return Share(v)
        return Share(ShareArray(self, v, t))

    def from_preproc(self, fp: FpArray, t: int | None = None) -> ShareArray:
        """Wrap a dealt [n, k] share tensor (SimBackend) as a ShareArray."""
        return ShareArray(self, fp, t)

    def preproc_triples(self, k: int, like: ShareArray):
        a, b, ab = self.preproc.get_triples(k)
        return (self.from_preproc(a), self.from_preproc(b),
                self.from_preproc(ab))

    def preproc_rands(self, k: int, like: ShareArray):
        return self.from_preproc(self.preproc.get_rands(k))

    def preproc_double_shares(self, k: int, like: ShareArray):
        r_t, r_2t = self.preproc.get_double_shares(k)
        return (self.from_preproc(r_t),
                self.from_preproc(r_2t, t=2 * self.t))

    def call_mixin(self, name: str, *args):
        assert name in self.config, f"missing mixin {name}"
        return self.config[name](self, *args)

    # -- opening -----------------------------------------------------------
    def open_share_array(self, sa: ShareArray) -> FpArray:
        """Open with degree-aware chunking; pads B to a multiple of
        degree+1 with zero shares (always valid sharings of 0)."""
        d = sa.t
        k = d + 1
        B = sa.v.shape[-1]
        pad = (-B) % k
        v = sa.v
        if pad:
            zshape = v.shape[:-1] + (pad,)
            v = FpArray.concatenate([v, FpArray.zeros(zshape)],
                                    axis=v.ndim - 1)
        if self.sim:
            from ..parallel.reconstruct import sim_batch_reconstruct
            secrets, nerr = sim_batch_reconstruct(
                v, self.n, d, self.use_omega_powers, self.robust)
            _assert_party_agreement(secrets)
        else:
            secrets, nerr = batch_reconstruct(
                self.backend, v, self.n, d,
                use_omega_powers=self.use_omega_powers, robust=self.robust)
        self.opened_count += B
        self.nerr_total = self.nerr_total + nerr
        if pad:
            secrets = FpArray(secrets.limbs[..., :B])
        return secrets

    def open_double_share_array(self, sa: ShareArray) -> FpArray:
        assert sa.t == 2 * self.t
        return self.open_share_array(sa)

    def open_share_arrays(self, sas) -> list:
        """Open several independent ShareArrays in ONE reconstruction
        (VERDICT r04 #6 — the latency composition for many small opens):
        same-degree arrays are flattened and concatenated on the element
        axis, opened with a single two-round protocol run / device
        dispatch, and split back. Per-dispatch cost (a ~1.5 ms round trip
        on a remote-tunneled chip; one collective round in a mesh
        deployment) is paid once instead of len(sas) times."""
        sas = list(sas)
        if not sas:
            return []
        d = sas[0].t
        assert all(s.t == d for s in sas), [s.t for s in sas]
        lead = sas[0].v.shape[:self.lead]
        flats = []
        shapes = []
        for s in sas:
            shapes.append(s.v.shape[self.lead:])
            total = 1
            for dim in shapes[-1]:
                total *= dim
            flats.append(s.v.reshape(lead + (total,)))
        cat = FpArray.concatenate(flats, axis=len(lead))
        opened = self.open_share_array(ShareArray(self, cat, d))
        outs = []
        off = 0
        olead = opened.shape[:-1]            # sim backends replicate
        for shape in shapes:
            total = 1
            for dim in shape:
                total *= dim
            outs.append(FpArray(
                opened.limbs[..., off:off + total]).reshape(olead + shape))
            off += total
        return outs
