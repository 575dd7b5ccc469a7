"""Build the native helper library: ``python -m magicdrive_tpu.native.build``."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "libmagicdrive_native.so")


def build(verbose: bool = True) -> str:
    srcs = [os.path.join(HERE, "csrc", "bitpack.cc"),
            os.path.join(HERE, "csrc", "raster.cc")]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", OUT] + srcs
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
