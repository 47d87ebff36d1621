#!/usr/bin/env python
"""Standalone producer shim: replay synthetic sectors onto the wire.

Equivalent to the reference's external data source in its localhost test
topology (SURVEY.md section 4.5).  `python tools/producer.py --sectors 8`.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wrp_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(["produce", *sys.argv[1:]]))
