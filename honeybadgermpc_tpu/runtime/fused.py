"""Fused MPC programs: run a whole data-oblivious MPC program as ONE
jitted device program (SimBackend), with preprocessing functionalized.

Why: every eager op dispatch costs 15-200 ms on a remote-tunneled TPU
backend, and an MPC program is hundreds of small ops (a Jubjub point add
alone is ~9 batched opens plus local algebra — measured 4.7 point-ops/s
eager vs thousands fused). The reference amortizes per-op overhead with
asyncio batching (mpc.py:280 TaskProgramRunner); the TPU-native analogue is
tracing the *entire program* — opens included, via the in-graph fused
reconstruction kernels (parallel/reconstruct.py) — into a single XLA
program.

Contract: the program must be DATA-OBLIVIOUS (its Python control flow may
depend on shapes, never on opened values) — which is exactly the MPC
security model, so every honest protocol qualifies. Host-opening values
(``Share.open()`` → int) inside a fused program raises a tracer error.

Mechanics (two phases, both cached per (program, shapes, context params)):
  1. counting pass — ``jax.eval_shape`` traces the program against a
     recording preprocessing stub to learn how many elements of each kind
     (triples, cubes, rands, ...) it consumes, with zero device work;
  2. replay — the real pool elements are taken from ``ctx.preproc`` ONCE
     as whole tensors and passed as jit *arguments* (never baked as
     constants), and a tape stub deals them out statically during trace.
"""

from __future__ import annotations

import jax

from ..ops.fparray import FpArray
from .context import MpcContext, ShareArray

# kind -> (getter name, number of component arrays)
_KINDS = {
    "triples": ("get_triples", 3),
    "cubes": ("get_cubes", 3),
    "rands": ("get_rands", 1),
    "zeros": ("get_zeros", 1),
    "bits": ("get_bits", 1),
    "one_minus_ones": ("get_one_minus_ones", 1),
    "double_shares": ("get_double_shares", 2),
    "share_bits": ("get_share_bits", 2),
}


class _CountingPreproc:
    """Records per-kind totals; hands back zero placeholders (the counting
    pass runs under eval_shape, so values are never computed)."""

    def __init__(self, n: int):
        self.n = n
        self.counts: dict[str, int] = {}

    def _rec(self, kind: str, k: int, parts: int, extra=()):  # -> FpArrays
        self.counts[kind] = self.counts.get(kind, 0) + k
        outs = tuple(FpArray.zeros((self.n, k) + e)
                     for e in ([()] * parts if not extra else extra))
        return outs if len(outs) > 1 else outs[0]

    def get_triples(self, k):
        return self._rec("triples", k, 3)

    def get_cubes(self, k):
        return self._rec("cubes", k, 3)

    def get_rands(self, k):
        return self._rec("rands", k, 1)

    def get_zeros(self, k):
        return self._rec("zeros", k, 1)

    def get_bits(self, k):
        return self._rec("bits", k, 1)

    def get_one_minus_ones(self, k):
        return self._rec("one_minus_ones", k, 1)

    def get_double_shares(self, k):
        return self._rec("double_shares", k, 2)

    def get_share_bits(self, k):
        # (r [n,k], bits [n,k,bl]); bit length fixed by the dealer (255)
        return self._rec("share_bits", k, 2, extra=[(), (255,)])


class _TapePreproc:
    """Deals prefetched pool tensors out in program order. ``arrays`` maps
    kind -> tuple of FpArray [n, total, ...]; slices are static (trace-time
    cursors), so the whole replay stays one compiled program."""

    def __init__(self, arrays: dict):
        self._arrays = arrays
        self._cursor = {k: 0 for k in arrays}

    def _slice(self, kind: str, k: int):
        c = self._cursor[kind]
        self._cursor[kind] = c + k
        outs = tuple(FpArray(a.limbs[:, :, c:c + k]) for a in
                     self._arrays[kind])
        return outs if len(outs) > 1 else outs[0]

    def __getattr__(self, name):
        if name.startswith("get_"):
            kind = name[4:]
            if kind in _KINDS:
                return lambda k: self._slice(kind, k)
        raise AttributeError(name)


def _flatten_result(out):
    """Program result -> (leaves: list of limb arrays, spec to rebuild)."""
    if isinstance(out, ShareArray):
        return [out.v.limbs], ("sh", out.t)
    if isinstance(out, FpArray):
        return [out.limbs], ("fp",)
    if isinstance(out, (tuple, list)):
        leaves, specs = [], []
        for o in out:
            lv, sp = _flatten_result(o)
            leaves.extend(lv)
            specs.append((sp, len(lv)))
        return leaves, ("seq", type(out) is tuple, tuple(specs))
    if isinstance(out, dict):
        leaves, specs = [], []
        for key in sorted(out):
            lv, sp = _flatten_result(out[key])
            leaves.extend(lv)
            specs.append((key, sp, len(lv)))
        return leaves, ("dict", tuple(specs))
    raise TypeError(
        f"fused program returned {type(out)}; supported: ShareArray, "
        "FpArray, tuple/list/dict thereof")


def _rebuild_result(ctx, leaves, spec):
    kind = spec[0]
    if kind == "sh":
        return ctx.ShareArray(FpArray(leaves[0]), spec[1])
    if kind == "fp":
        return FpArray(leaves[0])
    if kind == "seq":
        _, is_tuple, specs = spec
        out, i = [], 0
        for sp, ln in specs:
            out.append(_rebuild_result(ctx, leaves[i:i + ln], sp))
            i += ln
        return tuple(out) if is_tuple else out
    if kind == "dict":
        out, i = {}, 0
        for key, sp, ln in spec[1]:
            out[key] = _rebuild_result(ctx, leaves[i:i + ln], sp)
            i += ln
        return out
    raise AssertionError(spec)


def fused_demand(ctx: MpcContext, prog, *args) -> dict:
    """Per-call preprocessing demand (kind -> count) of a fused program —
    for pre-dealing pools outside a measured region. Builds (and caches)
    the program if needed."""
    shares = [_as_share(ctx, a) for a in args]
    key = (prog, ctx.n, ctx.t, ctx.robust, ctx.use_omega_powers,
           tuple((s.v.limbs.shape, s.t) for s in shares))
    hit = _CACHE.get(key)
    if hit is None:
        hit = _build(ctx, prog, shares)
        _cache_put(key, hit)
    return dict(hit[1])


def _deal_deficit(ctx, kind: str, total: int):
    """Generate the pool deficit, rounded UP to a power of two: the dealer
    kernel compiles per batch size, so padded generation keeps one cached
    compile instead of a fresh multi-second compile per odd deficit."""
    have = ctx.preproc._pool(kind).remaining()
    if have >= total:
        return
    need = total - have
    chunk = 1 << max(need - 1, 1).bit_length()
    getattr(ctx.preproc, "generate_" + kind)(chunk)


def _as_share(ctx, a):
    if isinstance(a, ShareArray):
        return a
    if isinstance(a, FpArray):
        return ctx.ShareArray(a)
    raise TypeError(f"fused program arg must be ShareArray/FpArray, got "
                    f"{type(a)}")


_CACHE: dict = {}
_CACHE_CAP = 128


def _cache_put(key, val):
    """Bounded insert (FIFO eviction): keys hold the program FUNCTION
    OBJECT, so accidental fresh-lambda callers would otherwise leak a
    compiled XLA program per call — with the cap they degrade to
    retracing instead of unbounded growth."""
    if len(_CACHE) >= _CACHE_CAP:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = val


def run_fused(ctx: MpcContext, prog, *args, auto_deal: bool = False):
    """Run ``prog(ctx2, *args)`` as one jitted device program.

    ctx must be a SimBackend context with a PreProcessedElements dealer;
    args are ShareArrays (or dealt [n, B] FpArrays). The needed
    preprocessing is consumed from ctx.preproc exactly once per call;
    with ``auto_deal`` the dealer generates any deficit first (test/bench
    convenience — matches the reference test fixture's generate-on-demand,
    tests/fixtures.py:144-200).
    Caching is per (prog, arg shapes/degrees, context params) — reuse the
    same function object across calls (avoid fresh lambdas)."""
    assert ctx.sim, "run_fused requires the SimBackend (sim) context"
    shares = [_as_share(ctx, a) for a in args]
    key = (prog, ctx.n, ctx.t, ctx.robust, ctx.use_omega_powers,
           tuple((s.v.limbs.shape, s.t) for s in shares))
    hit = _CACHE.get(key)
    if hit is None:
        hit = _build(ctx, prog, shares)
        _cache_put(key, hit)
    g, counts = hit

    pools = {}
    for kind, total in counts.items():
        getter, _parts = _KINDS[kind]
        if auto_deal:
            _deal_deficit(ctx, kind, total)
        got = getattr(ctx.preproc, getter)(total)
        pools[kind] = got if isinstance(got, tuple) else (got,)
    pool_limbs = {k: tuple(a.limbs for a in v) for k, v in pools.items()}
    leaves = g(tuple(s.v.limbs for s in shares), pool_limbs)
    return _rebuild_result(ctx, list(leaves), g.out_spec)


def run_fused_scan(ctx: MpcContext, step, carry, steps: int, per_step=None,
                   auto_deal: bool = False):
    """Run ``steps`` iterations of ``step(ctx2, carry, x_i) -> carry`` as
    ONE jitted ``lax.scan`` device program.

    The TPU-native shape for round-structured protocols (MiMC's 161
    rounds, a Jubjub scalar ladder, butterfly rounds): the step body is
    traced once, per-step preprocessing rides the scan axis, so program
    size is O(step) instead of O(steps * step) — which keeps giant
    programs inside the compile helper's memory budget.

    carry: tuple of ShareArrays (or dealt FpArrays) — shapes must be
    invariant under ``step``. per_step: optional pytree of jnp arrays with
    leading axis ``steps``, delivered per iteration (public round
    constants, ladder bits, ...)."""
    assert ctx.sim, "run_fused_scan requires the SimBackend (sim) context"
    import jax.numpy as jnp

    carry = tuple(_as_share(ctx, a) for a in carry)
    ps_leaves = jax.tree.leaves(per_step) if per_step is not None else []
    assert all(l.shape[0] == steps for l in ps_leaves), \
        "per_step leading axis must equal steps"
    key = ("scan", step, ctx.n, ctx.t, ctx.robust, ctx.use_omega_powers,
           steps, tuple((s.v.limbs.shape, s.t) for s in carry),
           tuple((tuple(l.shape), str(l.dtype)) for l in ps_leaves))
    hit = _CACHE.get(key)
    if hit is None:
        hit = _build_scan(ctx, step, carry, steps, per_step)
        _cache_put(key, hit)
    g, per_step_counts = hit

    pools = {}
    for kind, c in per_step_counts.items():
        total = c * steps
        getter, _parts = _KINDS[kind]
        if auto_deal:
            _deal_deficit(ctx, kind, total)
        got = getattr(ctx.preproc, getter)(total)
        parts = got if isinstance(got, tuple) else (got,)
        # [L, n, steps*c, ...] -> [steps, L, n, c, ...] (scan axis leading)
        moved = []
        for a in parts:
            lm = a.limbs
            lead, rest = lm.shape[:2], lm.shape[3:]
            lm = lm.reshape(lead + (steps, c) + rest)
            moved.append(jnp.moveaxis(lm, 2, 0))
        pools[kind] = tuple(moved)
    leaves = g(tuple(s.v.limbs for s in carry), pools,
               per_step if per_step is not None else ())
    return _rebuild_result(ctx, list(leaves), g.out_spec)


def _build_scan(ctx, step, carry, steps, per_step):
    import jax.numpy as jnp

    n, t = ctx.n, ctx.t
    carry_ts = tuple(s.t for s in carry)

    # -- counting pass over ONE step (abstract eval) -------------------------
    counter = _CountingPreproc(n)
    ps0 = jax.tree.map(lambda l: l[0], per_step) \
        if per_step is not None else ()

    def _count_run(carry_limbs, x0):
        ctx2 = MpcContext(n, t, preproc=counter,
                          use_omega_powers=ctx.use_omega_powers,
                          robust=ctx.robust)
        args2 = tuple(ctx2.ShareArray(FpArray(l), tt)
                      for l, tt in zip(carry_limbs, carry_ts))
        out = step(ctx2, args2, x0)
        return tuple(s.v.limbs for s in out)

    out_shapes = jax.eval_shape(_count_run,
                                tuple(s.v.limbs for s in carry), ps0)
    counts = dict(counter.counts)
    in_shapes = tuple(s.v.limbs.shape for s in carry)
    assert tuple(o.shape for o in out_shapes) == in_shapes, \
        f"scan carry shape changed: {in_shapes} -> {out_shapes}"

    spec_cell = {}

    @jax.jit
    def g(carry_limbs, pools, per_step_xs):
        def body(carry_l, xs):
            pool_i, x_i = xs
            tape = _TapePreproc(
                {k: tuple(FpArray(l) for l in v) for k, v in pool_i.items()})
            ctx2 = MpcContext(n, t, preproc=tape,
                              use_omega_powers=ctx.use_omega_powers,
                              robust=ctx.robust)
            args2 = tuple(ctx2.ShareArray(FpArray(l), tt)
                          for l, tt in zip(carry_l, carry_ts))
            out = step(ctx2, args2, x_i)
            leaves, spec = _flatten_result(tuple(out))
            spec_cell["spec"] = spec
            return tuple(leaves), None

        out, _ = jax.lax.scan(body, carry_limbs, (pools, per_step_xs),
                              length=steps)
        return out

    class _G:
        def __call__(self, carry_limbs, pools, per_step_xs):
            out = g(carry_limbs, pools, per_step_xs)
            self.out_spec = spec_cell["spec"]
            return out

    return _G(), counts


def _build(ctx, prog, shares):
    n, t = ctx.n, ctx.t
    arg_ts = tuple(s.t for s in shares)

    # -- counting pass (abstract eval: no device work) ----------------------
    counter = _CountingPreproc(n)

    def _count_run(arg_limbs):
        ctx2 = MpcContext(n, t, preproc=counter,
                          use_omega_powers=ctx.use_omega_powers,
                          robust=ctx.robust)
        args2 = [ctx2.ShareArray(FpArray(l), tt)
                 for l, tt in zip(arg_limbs, arg_ts)]
        out = prog(ctx2, *args2)
        leaves, _spec = _flatten_result(out)
        return leaves

    jax.eval_shape(_count_run, tuple(s.v.limbs for s in shares))
    counts = dict(counter.counts)

    # -- replay (the real compiled program) ---------------------------------
    spec_cell = {}

    @jax.jit
    def g(arg_limbs, pool_limbs):
        tape = _TapePreproc(
            {k: tuple(FpArray(l) for l in v) for k, v in pool_limbs.items()})
        ctx2 = MpcContext(n, t, preproc=tape,
                          use_omega_powers=ctx.use_omega_powers,
                          robust=ctx.robust)
        args2 = [ctx2.ShareArray(FpArray(l), tt)
                 for l, tt in zip(arg_limbs, arg_ts)]
        out = prog(ctx2, *args2)
        leaves, spec = _flatten_result(out)
        spec_cell["spec"] = spec
        return tuple(leaves)

    class _G:
        """Tiny wrapper exposing out_spec once traced."""

        def __call__(self, arg_limbs, pool_limbs):
            out = g(arg_limbs, pool_limbs)
            self.out_spec = spec_cell["spec"]
            return out

    wrapper = _G()
    return wrapper, counts
