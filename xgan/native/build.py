"""Build the native artifact codec (g++ -> libxganpng.so).

Run: python -m xgan.native.build
The loader (xgan.native) also builds on first use when the .so is missing.
"""
from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "png_writer.cpp")
SO = os.path.join(HERE, "libxganpng.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC,
           "-lpng", "-lz", "-pthread", "-o", SO]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return SO


if __name__ == "__main__":
    build()
    print(f"built {SO}")
