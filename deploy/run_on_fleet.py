"""Fleet deployment: per-host configs, share distribution, remote launch.

TPU-native analog of the reference's EC2 tooling (aws/run-on-ec2.py):
per-VM JSON config generation (L15-39), preprocessed-share distribution
(L60-90, S3 there; scp/gsutil command emission here), and threaded remote
execution (L42-57, paramiko there; OpenSSH subprocesses here — no cloud
SDK dependency, works against any SSH-reachable fleet incl. GCP TPU VMs).

Usage:
  python deploy/run_on_fleet.py gen-configs  fleet.json out_dir/
  python deploy/run_on_fleet.py gen-preproc  fleet.json out_dir/ --rands 1024 --triples 1024
  python deploy/run_on_fleet.py push         fleet.json out_dir/
  python deploy/run_on_fleet.py run          fleet.json "python apps/process_main.py -d -f {conf}"

fleet.json:
  {"n": 4, "t": 1, "port": 7000,
   "hosts": ["10.0.0.1", "10.0.0.2", "10.0.0.3", "10.0.0.4"],
   "ssh_user": "mpc", "remote_dir": "/opt/hbmpc",
   "extra": {"k": 1024, "run_id": "demo"}}

hosts may be shorter than n (parties wrap around hosts — several parties
per machine on distinct ports), matching the reference's VM packing.
"""

import argparse
import json
import os
import shlex
import subprocess
import sys
import threading


def load_fleet(path):
    with open(path) as f:
        spec = json.load(f)
    n = spec["n"]
    hosts = spec["hosts"]
    base_port = spec.get("port", 7000)
    peers = {}
    for i in range(n):
        host = hosts[i % len(hosts)]
        port = base_port + (i // len(hosts))
        peers[i] = (host, port)
    return spec, peers


def gen_configs(spec, peers, out_dir):
    """Per-party config files (reference aws/run-on-ec2.py:15-39 /
    config.py:73-124 format)."""
    os.makedirs(out_dir, exist_ok=True)
    n, t = spec["n"], spec["t"]
    paths = []
    for i in range(n):
        cfg = {
            "N": n,
            "t": t,
            "my_id": i,
            "peers": [f"{ip}:{port}" for ip, port in
                      (peers[j] for j in sorted(peers))],
            "skip_preprocessing": spec.get("skip_preprocessing", False),
            "extra": spec.get("extra", {}),
        }
        path = os.path.join(out_dir, f"fleet.{i}.json")
        with open(path, "w") as f:
            json.dump(cfg, f, indent=1)
        paths.append(path)
    return paths


def gen_preproc(spec, out_dir, rands=0, triples=0, bits=0):
    """Dealer-side preprocessing, written per party (reference
    aws/run-on-ec2.py:60-76 generates then uploads share files)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

    n, t = spec["n"], spec["t"]
    pre = PreProcessedElements(n, t, seed=spec.get("seed", 0))
    if rands:
        pre.generate_rands(rands)
    if triples:
        pre.generate_triples(triples)
    if bits:
        pre.generate_bits(bits)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "sharedata")   # directory of .npy pools
    pre.save(path)
    return path


def _ssh(spec, host, cmd):
    user = spec.get("ssh_user")
    target = f"{user}@{host}" if user else host
    return ["ssh", "-o", "StrictHostKeyChecking=no", target, cmd]


def _scp(spec, local, host, remote):
    user = spec.get("ssh_user")
    target = f"{user}@{host}" if user else host
    return ["scp", "-o", "StrictHostKeyChecking=no", local,
            f"{target}:{remote}"]


def push(spec, peers, out_dir, dry_run=False):
    """Distribute configs + share data to each party's host (reference
    S3 distribution, aws/run-on-ec2.py:60-90)."""
    remote_dir = spec.get("remote_dir", "~/hbmpc")
    cmds = []
    for i, (host, _port) in sorted(peers.items()):
        for fname in (f"fleet.{i}.json", "sharedata"):
            local = os.path.join(out_dir, fname)
            if os.path.isdir(local):
                cmd = _scp(spec, local, host, f"{remote_dir}/")
                cmd.insert(1, "-r")
                cmds.append(cmd)
            elif os.path.exists(local):
                cmds.append(_scp(spec, local, host,
                                 f"{remote_dir}/{fname}"))
    return _run_all(cmds, dry_run)


def run(spec, peers, template, dry_run=False):
    """Threaded remote launch, one command per party (reference
    run_commands_on_instances, aws/run-on-ec2.py:42-57)."""
    remote_dir = spec.get("remote_dir", "~/hbmpc")
    cmds = []
    for i, (host, _port) in sorted(peers.items()):
        conf = f"{remote_dir}/fleet.{i}.json"
        cmd = template.format(conf=conf, my_id=i, remote_dir=remote_dir)
        cmds.append(_ssh(spec, host, f"cd {remote_dir} && {cmd}"))
    return _run_all(cmds, dry_run)


def _run_all(cmds, dry_run):
    if dry_run:
        for c in cmds:
            print(" ".join(shlex.quote(x) for x in c))
        return 0
    rcs = [None] * len(cmds)

    def work(idx, c):
        rcs[idx] = subprocess.call(c)

    threads = [threading.Thread(target=work, args=(i, c))
               for i, c in enumerate(cmds)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    bad = [i for i, rc in enumerate(rcs) if rc]
    if bad:
        print(f"failed on {len(bad)} host(s): {bad}", file=sys.stderr)
        return 1
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("action", choices=["gen-configs", "gen-preproc",
                                       "push", "run"])
    ap.add_argument("fleet")
    ap.add_argument("target", nargs="?", default="deploy_out")
    ap.add_argument("--rands", type=int, default=0)
    ap.add_argument("--triples", type=int, default=0)
    ap.add_argument("--bits", type=int, default=0)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)
    spec, peers = load_fleet(args.fleet)
    if args.action == "gen-configs":
        for p in gen_configs(spec, peers, args.target):
            print(p)
        return 0
    if args.action == "gen-preproc":
        print(gen_preproc(spec, args.target, args.rands, args.triples,
                          args.bits))
        return 0
    if args.action == "push":
        return push(spec, peers, args.target, args.dry_run)
    return run(spec, peers, args.target, args.dry_run)


if __name__ == "__main__":
    sys.exit(main())
