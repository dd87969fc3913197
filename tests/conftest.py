"""Test env: force CPU with 8 virtual devices so the party mesh / sharding
paths compile and run hermetically without TPU hardware (the driver benches
on the real chip). Must run before jax is imported anywhere."""

import os
import sys

# The container's default env routes ALL XLA work (even CPU compiles and
# host transfers) through the axon TPU tunnel (PALLAS_AXON_REMOTE_COMPILE),
# which turns each kernel compile into a multi-second network round trip.
# The hook is installed by sitecustomize before conftest runs, so the only
# clean escape is to re-exec pytest with the axon plugin stripped.
if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("HBMPC_TEST_REEXEC") != "1":
    # Restore the real stdout/stderr fds before exec: pytest has already
    # started global fd capture when conftests load, and the dup'd originals
    # are close-on-exec, so without this the re-exec'd run reports into a
    # dead temp file.
    try:
        import gc

        from _pytest.capture import CaptureManager

        for _obj in gc.get_objects():
            if isinstance(_obj, CaptureManager):
                _obj.suspend_global_capture()
                break
    except Exception:
        pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["HBMPC_TEST_REEXEC"] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if ".axon_site" not in p)
    # single-threaded LLVM codegen: the parallel path in this jaxlib build
    # segfaults sporadically during compilation
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_cpu_parallel_codegen_split_count=1").strip()
    # Persistent XLA compilation cache (VERDICT r04 #5). Two subtleties:
    # 1. the field kernels are MANY sub-second compiles, so the default
    #    min-compile-time gate (1 s) caches nothing — set it to 0;
    # 2. cpu_aot_loader logs a machine-feature-mismatch error per reload
    #    (the +prefer-no-{scatter,gather} pseudo-features aren't in the
    #    host feature list). They are tuning hints, not ISA features; the
    #    reloads execute correctly, and a genuine SIGILL would be caught
    #    by the signal-retry supervisor below.
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..",
                                ".xla_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    # Supervisor instead of a bare exec, for two reasons:
    # 1. this jaxlib's XLA:CPU segfaults/aborts sporadically mid-compile,
    #    and the failure rate grows with accumulated in-process compiles —
    #    so a full `tests/` run is SHARDED into fresh subprocesses of a few
    #    test files each;
    # 2. signal deaths are retried (genuine test failures exit normally
    #    and are not).
    import glob
    import subprocess

    def run_group(targets):
        # xdist workers are fresh processes: parallelizes the cold XLA
        # compiles AND sidesteps this jaxlib's in-process compile slowdown
        # (a long single-process run degrades several-fold)
        xdist = [] if any(a.startswith("-n") for a in flags) else ["-n", "4"]
        for attempt in range(3):
            rc = subprocess.call(
                [sys.executable, "-m", "pytest"] + flags + xdist + targets,
                env=env)
            if 0 <= rc < 128:
                return rc
            sys.stderr.write(
                f"\n[conftest] pytest died with signal (rc={rc}); retry "
                f"{attempt + 1}/2\n")
        return rc

    args = sys.argv[1:]
    flags = [a for a in args if a.startswith("-")]
    targets = [a for a in args if not a.startswith("-")]
    whole_suite = all(t.rstrip("/") in ("tests", "tests/") for t in targets) \
        and targets
    if not whole_suite:
        sys.exit(run_group(targets))
    files = sorted(glob.glob(os.path.join(targets[0].rstrip("/"),
                                          "test_*.py")))
    GROUP = 4
    worst = 0
    for i in range(0, len(files), GROUP):
        rc = run_group(files[i:i + GROUP])
        if rc == 5:   # no tests collected in this group
            rc = 0
        worst = worst or rc
        if worst and ("-x" in flags or "--exitfirst" in flags):
            break
    sys.exit(worst)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache also for direct (non-re-exec'd) runs.
# r04 disabled this citing cpu_aot_loader reload segfaults, but that note
# predates the min-compile-time fix above: with the default 1 s gate the
# cache never stored anything, so reload was never actually exercised.
# Measured r05: field+gao reload runs are clean and the whole-suite wall
# drops severalfold on a warm cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".xla_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import random

import numpy as np
import pytest

from honeybadgermpc_tpu.elliptic_curve import Subgroup
from honeybadgermpc_tpu.field import GF


@pytest.fixture(scope="session")
def galois_field():
    return GF(Subgroup.BLS12_381)


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture
def np_rng():
    return np.random.default_rng(1234)
