"""Build the native extension in-place (no pip, no pybind11).

Usage: python -m spinnerf_tpu.native.build
Compiles `colmap_native.cpp` into this package directory with g++ -O3.
"""
from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path


def build(verbose: bool = True) -> Path:
    here = Path(__file__).parent
    src = here / "colmap_native.cpp"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = here / f"colmap_native{suffix}"
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", str(src), "-o", str(out)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    p = build()
    print(f"built {p}")
    sys.exit(0)
