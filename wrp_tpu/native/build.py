"""Build the native codec shared library (g++, no external deps).

Invoked automatically on first import of wrp_tpu.native.codec_native, or
manually: python -m wrp_tpu.native.build
"""

from __future__ import annotations

import subprocess
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRCS = [HERE / "codec.cpp", HERE / "ingest.cpp"]
LIB = HERE / "libwrpcodec.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force:
        if LIB.stat().st_mtime >= max(s.stat().st_mtime for s in SRCS):
            return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC",
        "-std=c++17", "-pthread", *map(str, SRCS), "-o", str(LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
