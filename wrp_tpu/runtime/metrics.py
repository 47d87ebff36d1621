"""Observability: per-stage timers, throughput counters, structured logs.

Formalises the reference's ad-hoc instrumentation (SURVEY.md section 5):
gettimeofday tick/tock pairs (gpu_1fp.cu:173-185), per-stage tocks
(read_gpu.cu), and the rpv2 ingest breakdown "msg rcv / deserialize /
restructuring" (rpv2.cu:343-387) — as reusable, levelled, optionally
JSON-structured components.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict

log = logging.getLogger("wrp_tpu")


def configure_logging(level: str = "INFO", structured: bool = False) -> None:
    handler = logging.StreamHandler()
    if structured:
        handler.setFormatter(_JsonFormatter())
    else:
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s %(message)s"))
    root = logging.getLogger("wrp_tpu")
    root.handlers[:] = [handler]
    root.setLevel(level.upper())


class _JsonFormatter(logging.Formatter):
    def format(self, record):
        payload = {
            "t": round(record.created, 3),
            "level": record.levelname,
            "msg": record.getMessage(),
        }
        extra = getattr(record, "fields", None)
        if extra:
            payload.update(extra)
        return json.dumps(payload)


class StageTimers:
    """Named accumulating wall-clock timers (the tick/tock ledger).

    Thread-safe: the ingest thread(s) and the compute thread update the
    same ledger concurrently (multi-feed mode has several ingest
    threads hitting the same keys), and `x += dt` on a dict entry is
    not atomic under the GIL."""

    def __init__(self):
        import threading

        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }


@dataclass
class Throughput:
    """Sectors/s counter with rolling window, the reference's headline
    number (BASELINE.md)."""

    window: float = 10.0
    count: int = 0
    started: float = field(default_factory=time.perf_counter)
    _events: list = field(default_factory=list)

    def tick(self, n: int = 1) -> None:
        now = time.perf_counter()
        self.count += n
        self._events.append((now, n))
        cutoff = now - self.window
        while self._events and self._events[0][0] < cutoff:
            self._events.pop(0)

    def rate(self) -> float:
        # prune here too: without it, a burst followed by an idle gap
        # longer than the window would still be reported as the
        # "current" rate by any caller that didn't just tick()
        now = time.perf_counter()
        cutoff = now - self.window
        while self._events and self._events[0][0] < cutoff:
            self._events.pop(0)
        if not self._events:
            return 0.0
        span = max(now - max(self._events[0][0], now - self.window), 1e-9)
        return sum(n for _, n in self._events) / span

    def overall(self) -> float:
        return self.count / max(time.perf_counter() - self.started, 1e-9)
