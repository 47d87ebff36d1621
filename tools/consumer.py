#!/usr/bin/env python
"""Standalone result consumer shim (visualiser stand-in, cf. the
reference's receive.cpp smoke tool)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wrp_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(["consume", *sys.argv[1:]]))
