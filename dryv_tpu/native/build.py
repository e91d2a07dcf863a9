"""Build the native entropy library with g++ (no external deps)."""
from __future__ import annotations

import os
import subprocess
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRCS = [HERE / "entropy.cc", HERE / "recon.cc", HERE / "deblock.cc"]
LIB = HERE / "libdryv_entropy.so"


def build(force: bool = False) -> Path:
    deps = SRCS + [HERE / "tables_data.h"]
    if LIB.exists() and not force and \
            LIB.stat().st_mtime >= max(s.stat().st_mtime for s in deps):
        return LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-march=native", *map(str, SRCS), "-o", str(LIB)]
    subprocess.run(cmd, check=True, cwd=HERE)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
