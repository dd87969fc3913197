"""Native host kernel loader. Builds the C++ extension on first import if
the compiled artifact is missing (g++ is in the image); all callers degrade
to pure-Python on failure."""

from __future__ import annotations

import importlib
import os
import sys

_native = None
_tried = False


def get_native():
    """The _hbmpc_native module, building it if needed; None on failure."""
    global _native, _tried
    if _tried:
        return _native
    _tried = True
    try:
        _native = importlib.import_module(
            "honeybadgermpc_tpu.native._hbmpc_native")
        return _native
    except ImportError:
        pass
    try:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        sys.path.insert(0, os.path.join(repo_root, "native"))
        import build as _build  # type: ignore
        _build.build()
        sys.path.pop(0)
        _native = importlib.import_module(
            "honeybadgermpc_tpu.native._hbmpc_native")
    except Exception:
        _native = None
    return _native


def int_to_bytes(v: int) -> bytes:
    return int(v).to_bytes(32, "little")


def ints_to_bytes(vals) -> bytes:
    return b"".join(int(v).to_bytes(32, "little") for v in vals)


def bytes_to_ints(raw: bytes):
    return [int.from_bytes(raw[i:i + 32], "little")
            for i in range(0, len(raw), 32)]
