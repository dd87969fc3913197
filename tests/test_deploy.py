"""Fleet deployment tooling (mirrors reference aws/run-on-ec2.py config
generation and command fan-out, dry-run only)."""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "deploy"))

import run_on_fleet as rf


def _spec(tmp_path):
    spec = {"n": 4, "t": 1, "port": 7000,
            "hosts": ["h1", "h2"], "ssh_user": "u",
            "remote_dir": "/opt/hbmpc", "extra": {"k": 8}}
    path = tmp_path / "fleet.json"
    path.write_text(json.dumps(spec))
    return str(path)


def test_gen_configs(tmp_path):
    spec, peers = rf.load_fleet(_spec(tmp_path))
    # parties wrap hosts: 4 parties on 2 hosts, two ports each
    assert peers == {0: ("h1", 7000), 1: ("h2", 7000),
                     2: ("h1", 7001), 3: ("h2", 7001)}
    out = tmp_path / "out"
    paths = rf.gen_configs(spec, peers, str(out))
    assert len(paths) == 4
    cfg = json.loads((out / "fleet.3.json").read_text())
    assert cfg["N"] == 4 and cfg["my_id"] == 3
    assert cfg["peers"] == ["h1:7000", "h2:7000", "h1:7001", "h2:7001"]
    assert cfg["extra"] == {"k": 8}


def test_push_and_run_dry(tmp_path, capsys):
    fleet = _spec(tmp_path)
    spec, peers = rf.load_fleet(fleet)
    out = tmp_path / "out"
    rf.gen_configs(spec, peers, str(out))
    assert rf.push(spec, peers, str(out), dry_run=True) == 0
    lines = capsys.readouterr().out.splitlines()
    assert any("scp" in ln and "fleet.0.json" in ln for ln in lines)
    assert rf.run(spec, peers, "python x.py -f {conf}", dry_run=True) == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 4
    assert all(ln.startswith("ssh") for ln in lines)
    assert "u@h1" in lines[0] and "fleet.0.json" in lines[0]


def test_gen_preproc_roundtrip(tmp_path):
    from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements

    fleet = _spec(tmp_path)
    spec, _peers = rf.load_fleet(fleet)
    path = rf.gen_preproc(spec, str(tmp_path / "out"), rands=8)
    pre2 = PreProcessedElements(4, 1, seed=0)
    pre2.load(path)
    got = pre2.get_rands(8)
    assert got.shape[0] == 4
