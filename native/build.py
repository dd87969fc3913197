"""Build the native extension in place:  python native/build.py
(Also invoked lazily by honeybadgermpc_tpu.native on first import.)"""

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "honeybadgermpc_tpu", "native")


def build_bls() -> str:
    """BLS12-381 shared library (ctypes, no Python headers)."""
    os.makedirs(OUT_DIR, exist_ok=True)
    target = os.path.join(OUT_DIR, "libbls12_381.so")
    src = os.path.join(HERE, "bls12_381.cpp")
    hdr = os.path.join(HERE, "bls_constants.h")
    if not os.path.exists(hdr) or \
            os.path.getmtime(hdr) < os.path.getmtime(
                os.path.join(HERE, "gen_bls_constants.py")):
        subprocess.check_call([sys.executable,
                               os.path.join(HERE, "gen_bls_constants.py")])
    if (os.path.exists(target) and
            os.path.getmtime(target) >= os.path.getmtime(src) and
            os.path.getmtime(target) >= os.path.getmtime(hdr)):
        return target
    subprocess.check_call([
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", target,
    ])
    return target


def build() -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    target = os.path.join(OUT_DIR, f"_hbmpc_native{suffix}")
    src = os.path.join(HERE, "hbmpc_native.cpp")
    try:
        build_bls()
    except Exception:
        pass            # BLS lib is optional; pure Python fallback exists
    if (os.path.exists(target) and
            os.path.getmtime(target) >= os.path.getmtime(src)):
        return target
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", target,
    ]
    subprocess.check_call(cmd)
    return target


if __name__ == "__main__":
    print(build())
