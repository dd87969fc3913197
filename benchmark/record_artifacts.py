"""Record the round's benchmark-grid artifacts (VERDICT r03 #3/#6):

  GRIDS_r04.json    — the reference's batch-opening grid ((4,1)/(7,2) plus
                      the (64,21) north star) with the decode path each
                      config takes, and the Gao robust-decode grid
                      t in {1,3,5,10,33,50,100}; run on the REAL chip.
  SCALING_r04.json  — the 1/2/4/8-device scaling curve of the headline
                      open with per-collective byte counts. Real multi-chip
                      is unavailable in this environment (the tunnel is one
                      chip), so the curve is recorded on the 8-virtual-
                      device CPU mesh — the program is identical to the
                      multi-chip one (HybridBackend under shard_map); the
                      byte counts are the ICI-relevant quantity.

Usage: python benchmark/record_artifacts.py [grids|scaling]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_benches(names, env=None):
    """Run run_benchmarks.py in a subprocess, collect its JSON lines."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmark",
                                      "run_benchmarks.py")] + names,
        capture_output=True, text=True, env=env, timeout=3600)
    rows = []
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if not rows:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
        raise RuntimeError(f"no results from {names}")
    return rows


def record_grids(path="GRIDS_r04.json"):
    rows = _run_benches(["batch_opening", "gao_decode", "asynchromix"])
    rec = {"artifact": "reference benchmark grids (SURVEY §6)",
           "backend": "tpu-tunnel", "rows": rows}
    with open(os.path.join(REPO, path), "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {path}: {len(rows)} rows")


def record_scaling(path="SCALING_r04.json"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8"
                        + " --xla_cpu_parallel_codegen_split_count=1").strip()
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if ".axon_site" not in p)
    rows = _run_benches(["scaling"], env=env)
    base = {r["params"]["batch"]: r["value"] for r in rows
            if r["params"]["devices"] == 1}
    for r in rows:
        d = r["params"]["devices"]
        b = base.get(r["params"]["batch"])
        if b:
            r["efficiency_vs_1dev"] = round(r["value"] / (b * d), 3) \
                if d > 1 else 1.0
    rec = {"artifact": "virtual-mesh scaling proxy (BASELINE >=80% @2 hosts"
                       " target; real multi-chip unavailable, see docstring)",
           "backend": "cpu-8-virtual-devices",
           "note": "Timing on a forced-CPU virtual mesh measures host "
                   "thread scheduling, NOT ICI: run-to-run efficiency at "
                   "2 devices has been observed between 0.71 and 0.84. "
                   "The load-bearing content is (a) the identical "
                   "HybridBackend shard_map program runs at every device "
                   "count and (b) the per-collective cross-device byte "
                   "counts, which ARE the ICI-relevant quantity.",
           "rows": rows}
    with open(os.path.join(REPO, path), "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {path}: {len(rows)} rows")


if __name__ == "__main__":
    which = sys.argv[1:] or ["grids", "scaling"]
    if "grids" in which:
        record_grids()
    if "scaling" in which:
        record_scaling()
