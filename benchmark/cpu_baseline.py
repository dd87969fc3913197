"""Measured single-core CPU baseline for the headline open benchmark.

Runs the reference-shaped batch-open pipeline (encode + two optimistic
decodes + re-encode validation — reed_solomon.py:305-332 /
rsdecode_impl.h:125-265 roles) single-threaded in native C++ 4x64-limb
Montgomery arithmetic (native/hbmpc_native.cpp::bench_open_pipeline), at
the BASELINE.json north-star configuration: n=64, t=21, ~2^16 shares.
This is ONE party's steady-state work — the same framing as the previous
analytic estimate (bench.py), conservative in the CPU's favor: the TPU
number simulates all 64 parties on one chip and still counts only the
opened shares.

Writes BASELINE_MEASURED.json at the repo root; bench.py picks it up as
the vs_baseline denominator (falling back to the analytic estimate when
the file is absent).

Usage: python benchmark/cpu_baseline.py
"""

import json
import os
import platform
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def measure(n=64, t=21, target_secs=6.0):
    from honeybadgermpc_tpu.native import get_native

    nat = get_native()
    assert nat is not None, "native extension failed to build"
    k = t + 1
    C = (1 << 16) // k + 1                   # C*k = smallest multiple >= 2^16
    # warmup + calibrate
    secs, chk = nat.bench_open_pipeline(n, t, C, 2)
    assert chk == 0, "validation mismatch: baseline pipeline is broken"
    iters = max(3, int(target_secs / max(secs / 2, 1e-9)))
    secs, chk = nat.bench_open_pipeline(n, t, C, iters)
    assert chk == 0
    rate = C * k * iters / secs
    return {
        "metric": "cpu_single_core_open_shares_per_s",
        "value": round(rate, 1),
        "unit": "shares/s",
        "n": n,
        "t": t,
        "batch": C * k,
        "iters": iters,
        "pipeline": "NTT encode + k-point matrix interpolate x2 "
                    "+ NTT re-encode validation x2 (one party)",
        "cpu": platform.processor() or platform.machine(),
        "nproc_unused": True,                # single thread by construction
    }


def measure_triples(n=64, t=21, k=100, target_secs=6.0):
    """Single-core randousha-shaped Beaver triple rate (ONE party's work:
    deal + hyperinvertible extraction NTTs per slot, local products, and
    the degree-2t finish open; verification decodes excluded — CPU-favoring,
    see native bench_triple_pipeline). The second of the reference's two
    performance determinants (docs/performance.rst)."""
    from honeybadgermpc_tpu.native import get_native

    nat = get_native()
    assert nat is not None, "native extension failed to build"
    secs, kt, chk = nat.bench_triple_pipeline(n, t, k, 2)
    assert chk == 0, "finish-open validation mismatch: baseline broken"
    iters = max(3, int(target_secs / max(secs / 2, 1e-9)))
    secs, kt, chk = nat.bench_triple_pipeline(n, t, k, iters)
    assert chk == 0
    rate = kt * iters / secs
    return {
        "metric": "cpu_single_core_triples_per_s",
        "value": round(rate, 1),
        "unit": "triples/s",
        "n": n,
        "t": t,
        "batch": kt,
        "iters": iters,
        "pipeline": "randousha deal+extract NTTs + local products + "
                    "degree-2t finish open (one party, no verify decodes)",
        "cpu": platform.processor() or platform.machine(),
    }


def main():
    out = measure()
    out["triples"] = measure_triples()
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
