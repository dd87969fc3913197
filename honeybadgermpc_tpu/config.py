"""Runtime configuration (reference config.py:38-124).

``HbmpcConfig.load_config()`` parses ``-d``/``-f config.json`` with N, t,
my_id, peers (ip:port), skip_preprocessing, free-form extra, and the
reconstruction sub-config (decoding algorithm, fault injection) — the same
JSON schema as the reference's conf/ files.
"""

from __future__ import annotations

import argparse
import json


class Algorithm:
    GAO = "gao"
    WELCH_BERLEKAMP = "welch-berlekamp"


class ReconstructionConfig:
    def __init__(self, induce_faults=False,
                 decoding_algorithm=Algorithm.GAO):
        assert decoding_algorithm in (Algorithm.GAO,
                                      Algorithm.WELCH_BERLEKAMP)
        self.induce_faults = induce_faults
        self.decoding_algorithm = decoding_algorithm

    @classmethod
    def from_dict(cls, d):
        return cls(d.get("induce_faults", False),
                   d.get("decoding_algorithm", Algorithm.GAO))


class HbmpcConfig:
    N = None
    t = None
    my_id = None
    peers = None
    skip_preprocessing = False
    extras = None
    reconstruction = ReconstructionConfig()
    time = None

    @classmethod
    def load_config(cls, argv=None):
        parser = argparse.ArgumentParser()
        parser.add_argument("-d", "--distributed", action="store_true")
        parser.add_argument("-f", "--config-file", type=str)
        parser.add_argument("-time", type=str, default=None)
        args, _ = parser.parse_known_args(argv)
        if not args.distributed:
            return cls
        with open(args.config_file) as f:
            cfg = json.load(f)
        cls.N = cfg["N"]
        cls.t = cfg["t"]
        cls.my_id = cfg["my_id"]
        cls.peers = {i: (a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1]))
                     for i, a in enumerate(cfg["peers"])}
        cls.skip_preprocessing = cfg.get("skip_preprocessing", False)
        cls.extras = cfg.get("extra", {})
        cls.reconstruction = ReconstructionConfig.from_dict(
            cfg.get("reconstruction", {}))
        cls.time = args.time
        return cls
