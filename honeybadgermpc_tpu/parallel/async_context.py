"""Per-process asynchronous MPC context for real-network deployments.

This is the process-parallel twin of runtime/context.py (reference mpc.py's
Mpc used under ProcessProgramRunner, ipc.py:117): each OS process holds ONE
party's share tensors; linear algebra runs on the local device; ``open``
exchanges columns over the NodeCommunicator and robust-decodes whatever
n-t-plus subset has arrived (the arrival-order IncrementalDecoder becomes
subset-decode-and-retry — SURVEY §5 network mapping note).
"""

from __future__ import annotations

import asyncio
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from ..ops.fparray import FpArray
from ..ops.gao import gao_robust_decode
from ..ops.limbs import L, P
from ..ops.rs import Encoding


class AsyncShareArray:
    """Local share tensor [B] of degree t, bound to an AsyncMpc."""

    __slots__ = ("ctx", "v", "t")

    def __init__(self, ctx, v: FpArray, t=None):
        self.ctx = ctx
        self.v = v
        self.t = ctx.t if t is None else t

    def _like(self, v, t=None):
        return AsyncShareArray(self.ctx, v, self.t if t is None else t)

    def __add__(self, other):
        if isinstance(other, AsyncShareArray):
            assert self.t == other.t
            return self._like(self.v + other.v)
        return self._like(self.v + _pub(other))

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, AsyncShareArray):
            return self._like(self.v - other.v)
        return self._like(self.v - _pub(other))

    def __rsub__(self, other):
        return self._like(_pub(other) - self.v)

    def __mul__(self, other):
        assert not isinstance(other, AsyncShareArray), \
            "share*share needs await ctx.mul(x, y)"
        return self._like(self.v * _pub(other))

    __rmul__ = __mul__

    async def open(self) -> FpArray:
        return await self.ctx.open_share_array(self)


def _pub(x):
    return FpArray.from_int(x) if isinstance(x, int) else x


class AsyncMpc:
    """sid-scoped context over (send, recv) (reference Mpc, mpc.py:26)."""

    def __init__(self, sid, n, t, my_id, send, recv, preproc=None,
                 mixins=None, use_omega_powers=False, config=None):
        self.sid, self.n, self.t, self.my_id = sid, n, t, my_id
        self.send, self.recv = send, recv
        self.preproc = preproc
        self.enc = Encoding(n, use_omega_powers=use_omega_powers)
        # reconstruction config (reference mpc.py:126-131 reads it from the
        # ConfigVars.Reconstruction entry): induce_faults makes THIS party
        # send random shares on every open; decoding_algorithm selects the
        # robust fallback decoder (RobustDecoderFactory, reed_solomon.py:545)
        from ..config import HbmpcConfig
        self.reconstruction = (config if config is not None
                               else HbmpcConfig.reconstruction)
        # decoder-use accounting, so tests/telemetry can assert which path
        # ran (optimistic fast path vs gao vs welch-berlekamp)
        self.decode_stats = defaultdict(int)
        self._share_id = 0
        self._open_buffers = defaultdict(lambda: defaultdict(dict))
        self._recv_task = None
        self._signal = asyncio.Event()
        # parties whose shares decoded as ERRORS: permanently excluded from
        # later opens (the reference IncrementalDecoder's confirmed-error
        # tracking, reed_solomon.py:352-361)
        self._error_parties: set = set()
        from ..utils.telemetry import BenchmarkLogger
        self.bench_logger = BenchmarkLogger(my_id)

    def ShareArray(self, v: FpArray, t=None) -> AsyncShareArray:
        return AsyncShareArray(self, v, t)

    async def _run(self, program):
        self._recv_task = asyncio.ensure_future(self._recv_loop())
        try:
            return await program(self)
        finally:
            self._recv_task.cancel()

    async def _recv_loop(self):
        """Demux R1/R2 columns into per-open buffers (mpc.py:244-277)."""
        while True:
            sender, (shareid, round_, arr) = await self.recv()
            buf = self._open_buffers[shareid][round_]
            if sender not in buf:
                buf[sender] = jnp.asarray(arr)
                self._signal.set()

    def _get_share_id(self):
        """Deterministic order-of-encounter id (mpc.py:47-56,76)."""
        self._share_id += 1
        return self._share_id - 1

    def _mark_errors(self, zs, err, shareid, round_):
        """err[..., i] True where party zs[i]'s column disagrees with the
        decoded codeword; confirmed-error parties are excluded from every
        later open (reference IncrementalDecoder, reed_solomon.py:352-361).
        Returns the set marked bad this call."""
        bad = {zs[i] for i in range(len(zs)) if bool(err[..., i].any())}
        if bad:
            self._error_parties |= bad
            self.bench_logger.record(
                "open.confirmed_errors", parties=sorted(bad),
                shareid=shareid, round=round_)
        return bad

    async def _gather_and_decode(self, shareid, round_, k, B):
        """Await >= n-t usable columns; OPTIMISTIC first — non-robust
        interpolation from the first k columns, re-encode, validate against
        everything received (reference IncrementalDecoder fast path,
        reed_solomon.py:305-332) — then fall back to the configured robust
        decoder (gao kernel or host welch-berlekamp,
        RobustDecoderFactory reed_solomon.py:545-558), retrying with more
        columns if the error bound is exceeded."""
        buf = self._open_buffers[shareid][round_]
        want = self.n - self.t
        robust_tried = False
        while True:
            while len(set(buf) - self._error_parties) < want:
                self._signal.clear()
                await self._signal.wait()
            zs = tuple(sorted(set(buf) - self._error_parties))
            ys = FpArray(jnp.stack([buf[z] for z in zs], axis=-1))
            if not robust_tried:
                # optimistic: the guess is THE codeword iff it agrees with
                # >= degree+1+max_errors-confirmed columns (uniqueness: any
                # codeword matching that many received values agrees with
                # >= degree+1 honest ones) — reed_solomon.py:302-303,334
                guess = self.enc.decode(zs[:k], ys[..., :k])
                reenc = FpArray(self.enc.encode(guess).limbs[..., list(zs)])
                err = ~np.asarray(reenc.eq(ys))          # [..., len(zs)]
                bad_cols = int(sum(bool(err[..., i].any())
                                   for i in range(len(zs))))
                needed = k + self.t - len(self._error_parties)
                if len(zs) - bad_cols >= needed:
                    self._mark_errors(zs, err, shareid, round_)
                    self.decode_stats["optimistic"] += 1
                    return guess
            robust_tried = True
            alg = self.reconstruction.decoding_algorithm
            if alg == "welch-berlekamp":
                from ..ops.welch_berlekamp import wb_robust_decode
                coeffs, reenc, ok = wb_robust_decode(self.enc, zs, ys, k)
            else:
                coeffs, reenc, ok = gao_robust_decode(self.enc, zs, ys, k)
            if bool(np.asarray(ok).all()):
                err = ~np.asarray(reenc.eq(ys))          # [..., len(zs)]
                self._mark_errors(zs, err, shareid, round_)
                self.decode_stats[alg] += 1
                return coeffs
            if want < self.n - len(self._error_parties):
                want += 1       # collect more and retry
            else:
                raise RuntimeError("robust decode failed with all n shares")

    async def open_share_array(self, sa: AsyncShareArray) -> FpArray:
        """Two-round batch open over the real network (SURVEY §3.1 call
        stack; batch_reconstruction.py:88)."""
        d = sa.t
        k = d + 1
        B = sa.v.shape[-1]
        pad = (-B) % k
        v = sa.v
        if pad:
            v = FpArray.concatenate(
                [v, FpArray.zeros((pad,))], axis=v.ndim - 1)
        C = v.shape[-1] // k
        shareid = self._get_share_id()
        from ..utils.telemetry import phase
        coeffs = v.reshape(C, k)
        # phase stamps mirror the reference's benchmark_logger brackets
        # (batch_reconstruction.py:119-121,170,188,199,217)
        with phase(self.bench_logger, "open.encode_send",
                   shareid=shareid, batch=B):
            cols = self.enc.encode(coeffs)               # [C, n]
            if self.reconstruction.induce_faults:
                # this party is CONFIGURED faulty: send random garbage in
                # place of its real columns (reference mpc.py:126-131,
                # batch_reconstruction.py:129-131; conf/mpc_with_faults)
                cols = self._random_like(cols)
            for j in range(self.n):
                self.send(j, (shareid, "R1",
                              np.asarray(cols.limbs[..., j])))
        with phase(self.bench_logger, "open.r1_decode", shareid=shareid):
            psi = await self._gather_and_decode(shareid, "R1", d + 1, C)
        vals = FpArray(psi.limbs[..., 0])                # [C]
        if self.reconstruction.induce_faults:
            vals = self._random_like(vals)
        with phase(self.bench_logger, "open.r2", shareid=shareid):
            for j in range(self.n):
                self.send(j, (shareid, "R2", np.asarray(vals.limbs)))
            sec = await self._gather_and_decode(shareid, "R2", k, C)
        out = sec.reshape(C * k)
        return FpArray(out.limbs[..., :B])

    def _random_like(self, x: FpArray) -> FpArray:
        """Random field elements with x's shape (fault injection)."""
        import secrets
        flat = [secrets.randbelow(P) for _ in range(x.size)]
        return FpArray.from_ints(
            np.array(flat, dtype=object).reshape(x.shape))

    async def mul(self, x: AsyncShareArray, y: AsyncShareArray):
        """Beaver multiply using local preprocessing slices."""
        B = x.v.shape[-1]
        a, b, ab = self.preproc.get_triples(B)
        # local party slice already selected by the loader
        d = await self.ShareArray(x.v - a).open()
        e = await self.ShareArray(y.v - b).open()
        return self.ShareArray(d * e + d * b + e * a + ab, x.t)


class LocalPreproc:
    """Per-party view over dealt share tensors (files written by
    PreProcessedElements.save; reference per-party .share files,
    preprocessing.py:152-169)."""

    def __init__(self, pre, my_id: int):
        self._pre = pre
        self.my_id = my_id

    def get_triples(self, k):
        a, b, ab = self._pre.get_triples(k)
        i = self.my_id
        return (FpArray(a.limbs[:, i]), FpArray(b.limbs[:, i]),
                FpArray(ab.limbs[:, i]))

    def get_rands(self, k):
        return FpArray(self._pre.get_rands(k).limbs[:, self.my_id])

    def get_zeros(self, k):
        return FpArray(self._pre.get_zeros(k).limbs[:, self.my_id])
