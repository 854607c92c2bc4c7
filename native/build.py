#!/usr/bin/env python
"""Build libbf_native.so with the system toolchain (no pip deps)."""

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent


def build(out_dir=None) -> pathlib.Path:
    out_dir = pathlib.Path(out_dir) if out_dir else HERE
    out = out_dir / "libbf_native.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(HERE / "bf_native.cpp"), "-o", str(out),
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
