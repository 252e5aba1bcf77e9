"""Build libasrrans.so (native batch rANS encoder). Usage: python build.py"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = True) -> str:
    srcs = [os.path.join(HERE, "rans_encode.cpp")]
    out = os.path.join(HERE, "libasrrans.so")
    cmd = (["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out]
           + srcs)
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    sys.exit(0 if os.path.exists(build()) else 1)
