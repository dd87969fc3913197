"""Tutorial 1: basic MPC programs on the simulated n-party network
(reference apps/tutorial/hbmpc-tutorial-1.py): Beaver multiplication,
pairwise swap with a shared bit, and a secret dot product."""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.models.butterfly import batch_switch
from honeybadgermpc_tpu.ops.fparray import FpArray
from honeybadgermpc_tpu.runtime.context import MpcContext
from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

P = Subgroup.BLS12_381


def main():
    n, t = 4, 1
    rng = random.Random(1)
    pre = PreProcessedElements(n, t, seed=0)
    pre.generate_triples(128)
    pre.generate_one_minus_ones(16)
    ctx = MpcContext(n, t, preproc=pre)

    def share(vals):
        return ctx.ShareArray(pre._share_values(FpArray.from_ints(vals)))

    # 1) Beaver multiplication
    xs = [rng.randrange(P) for _ in range(4)]
    ys = [rng.randrange(P) for _ in range(4)]
    prod = (share(xs) * share(ys)).open()
    assert list(prod.to_ints()[0]) == [x * y % P for x, y in zip(xs, ys)]
    print("beaver multiply: ok")

    # 2) secure pairwise swap (one butterfly switch)
    a, b = share([111]), share([222])
    sbit = ctx.from_preproc(pre.get_one_minus_ones(1))
    oa, ob = batch_switch(ctx, a, b, ctx.ShareArray(sbit.v))
    got = sorted([int(oa.open().to_ints()[0][0]), int(ob.open().to_ints()[0][0])])
    assert got == [111, 222]
    print("secret switch: ok")

    # 3) dot product: sum(x_i * y_i) via one batched multiply + local sum
    dp = (share(xs) * share(ys))
    from honeybadgermpc_tpu.runtime.comparison import _sum_last
    summed = _sum_last(dp.v)
    total = ctx.ShareArray(FpArray(summed.limbs[..., None]), dp.t).open()
    want = sum(x * y for x, y in zip(xs, ys)) % P
    assert int(total.to_ints()[0][0]) == want
    print("dot product: ok")


if __name__ == "__main__":
    main()
