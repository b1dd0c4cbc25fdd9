"""Build the native reference solver shared library.

Usage: python -m cilqr_tpu.native.build
The library is also built on demand by bindings.load() if missing/stale.
"""

from __future__ import annotations

import pathlib
import subprocess

SRC = pathlib.Path(__file__).parent / "cilqr_ref.cc"
LIB = pathlib.Path(__file__).parent / "libcilqr_ref.so"


def build(force: bool = False) -> pathlib.Path:
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", str(LIB),
           str(SRC)]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
