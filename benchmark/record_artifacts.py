"""Record the round's benchmark-grid artifacts (VERDICT r04 #3/#4):

  GRIDS_r05.json    — EVERY reference benchmark family on the real chip:
                      batch_opening (incl. the aggregated many-small-opens
                      mode), gao_decode (full t grid incl. 25 and 256),
                      asynchromix (butterfly n=4 + n=64 with offline
                      refill + power-mix), poly/FFT interpolate, MiMC,
                      jubjub, refinement, preprocessing, RBC, HBAVSS
                      light+batch, triple_generation. A family that fails
                      is recorded as an error row — no silent caps.
  SCALING_r05.json  — the 1/2/4/8-device scaling curve of the headline
                      open with per-collective byte counts, a compute-only
                      (zero-collective) control curve at the same device
                      counts, and an ANALYTIC projection of 2-chip
                      efficiency from the recorded collective bytes at
                      v5e ICI bandwidth. Real multi-chip is unavailable
                      here (the tunnel is one chip), so timing runs on the
                      8-virtual-device CPU mesh; the projection uses the
                      real chip's measured 1-device rate.

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


# dispatch-latency-sensitive families (batch_opening's aggregated rows,
# asynchromix epochs) run LAST so a concurrent host load from earlier
# families' compiles has drained
ALL_FAMILIES = [
    "gao_decode", "poly_interpolate", "fft_interpolate", "mimc", "jubjub",
    "refinement", "preprocessing", "rbc", "hbavss", "hbavss_batch",
    "triple_generation", "batch_opening", "asynchromix",
]


def record_grids(path="GRIDS_r05.json", families=None):
    rows = []
    for fam in families or ALL_FAMILIES:
        # one subprocess per family: an OOM/compile failure in one family
        # is recorded as an error row instead of killing the rest
        try:
            rows.extend(_run_benches([fam]))
        except Exception as e:
            rows.append({"bench": fam, "params": {},
                         "error": f"{type(e).__name__}: {e}"[:300],
                         "value": 0.0, "unit": "failed"})
            print(f"family {fam} FAILED: {type(e).__name__}")
    rec = {"artifact": "reference benchmark grids (SURVEY §6), all families",
           "backend": "tpu-tunnel", "rows": rows}
    with open(os.path.join(REPO, path), "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {path}: {len(rows)} rows")


def record_scaling(path="SCALING_r05.json"):
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

    # real-chip 1-device rate for the analytic projection (the tunnel
    # exposes exactly one chip, so only the devices=1 rows run)
    tpu_rows = []
    try:
        tpu_rows = [r for r in _run_benches(["scaling"])
                    if r["params"]["devices"] == 1]
    except Exception as e:
        print(f"tpu 1-dev scaling measurement failed: {type(e).__name__}")

    # Analytic 2-chip projection (VERDICT r04 #4b): the recorded
    # per-device collective bytes at v5e ICI bandwidth vs the real chip's
    # measured kernel time. Assumption (stated, conservative): a 2-chip
    # v5e mesh moves collective traffic over ONE ICI link pair at
    # 45 GB/s per direction (scaling-book v5e per-link one-way figure);
    # all_to_all send+recv overlap (full duplex), no compute overlap.
    ICI_BPS = 45e9
    projections = []
    for tr in tpu_rows:
        B = tr["params"]["batch"]
        t1 = B / tr["value"]                     # measured 1-chip seconds
        cpu2 = [r for r in rows
                if r["params"]["devices"] == 2
                and r["params"]["batch"] == B
                and r["params"].get("mode") == "collective"]
        if not cpu2:
            continue
        bytes2 = (cpu2[0]["params"]["a2a_bytes_per_dev"]
                  + cpu2[0]["params"]["allgather_bytes_per_dev"])
        t_comm = bytes2 / ICI_BPS
        eff = (t1 / 2) / (t1 / 2 + t_comm)
        projections.append({
            "batch": B, "tpu_1dev_shares_per_s": tr["value"],
            "tpu_1dev_seconds": round(t1, 6),
            "collective_bytes_per_dev_at_2": bytes2,
            "ici_bw_assumed_Bps": ICI_BPS,
            "t_comm_seconds": round(t_comm, 6),
            "projected_2chip_efficiency": round(eff, 3),
            "meets_80pct_target": eff >= 0.80,
        })

    rec = {"artifact": "virtual-mesh scaling proxy + compute-only control "
                       "+ analytic 2-chip ICI projection (BASELINE >=80% "
                       "@2 hosts target; real multi-chip unavailable)",
           "backend": "cpu-8-virtual-devices (timing) + tpu-tunnel "
                      "(1-dev rate for projection)",
           "note": "CPU virtual-mesh timing measures host thread "
                   "scheduling, NOT ICI. The compute-only rows run the "
                   "same total decode work with ZERO collectives: if they "
                   "collapse with device count like the collective rows, "
                   "the collapse is scheduling noise. The projection rows "
                   "convert the recorded per-device collective bytes to "
                   "ICI seconds at the stated v5e link bandwidth against "
                   "the REAL chip's measured 1-device time.",
           "rows": rows,
           "projection": projections}
    with open(os.path.join(REPO, path), "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {path}: {len(rows)} rows, "
          f"{len(projections)} projection rows")


if __name__ == "__main__":
    which = sys.argv[1:] or ["grids", "scaling"]
    if "grids" in which:
        record_grids()
    if "scaling" in which:
        record_scaling()
