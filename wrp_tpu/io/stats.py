"""Uniform ingest statistics across transports.

The reference had no loss accounting at all — dropped/duplicated UDP
datagrams silently corrupted a sector (SURVEY.md section 5).  Every
wrp_tpu transport (UDP, ZMQ, TCP) carries the same `stats` object so the
executor's summary is comparable regardless of wire.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class IngestStats:
    sectors: int = 0
    datagrams: int = 0
    dropped_datagrams: int = 0
    duplicate_datagrams: int = 0
    dropped_sectors: int = 0
    timeouts: int = 0
