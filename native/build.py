"""Build the native extension in place:  python native/build.py
(Also invoked lazily by honeybadgermpc_tpu.native on first import.)"""

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "honeybadgermpc_tpu", "native")


def build() -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    target = os.path.join(OUT_DIR, f"_hbmpc_native{suffix}")
    src = os.path.join(HERE, "hbmpc_native.cpp")
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
