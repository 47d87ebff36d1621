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
        self.intervals = None      # optional (name, thread, t0, t1) log
        self._annotate = False

    def enable_intervals(self, annotate: bool = False,
                         max_events: int = 500_000) -> None:
        """Record (name, thread, t0, t1) per timed section — the overlap
        evidence the totals can't carry (two stages each 50% busy may be
        serialised or perfectly concurrent).  annotate=True additionally
        wraps each section in jax.profiler.TraceAnnotation so the spans
        land in a chrome trace next to the device ops."""
        self.intervals = []
        self._max_events = max_events
        self._annotate = annotate

    def add_interval(self, name: str, t0: float, t1: float) -> None:
        """Log an explicit span (e.g. the device in-flight window the
        executor knows but no single `with` block covers)."""
        if self.intervals is not None and len(self.intervals) < \
                self._max_events:
            import threading

            with self._lock:
                self.intervals.append(
                    (name, threading.current_thread().name, t0, t1))

    @contextlib.contextmanager
    def time(self, name: str):
        ann = None
        if self._annotate:
            try:
                import jax.profiler

                ann = jax.profiler.TraceAnnotation(name)
                ann.__enter__()
            except Exception:
                ann = None
        t0 = time.perf_counter()
        try:
            yield
        finally:
            t1 = time.perf_counter()
            if ann is not None:
                ann.__exit__(None, None, None)
            dt = t1 - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1
                if self.intervals is not None and len(self.intervals) < \
                        self._max_events:
                    import threading

                    self.intervals.append(
                        (name, threading.current_thread().name, t0, t1))

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }


class LatencyStats:
    """Per-sector end-to-end latency reservoir: wire arrival (last row of
    the sector received) → products published.

    The serving metric the reference never measured: its instrumentation
    covered per-stage device work (read_gpu.cu tick/tock points) and the
    ingest decode breakdown (rpv2.cu:343-387 "msg rcv / deserialize /
    restructuring"), but nothing followed one sector through the whole
    stack — and for a real-time radar display the question is exactly
    "how stale is the sweep on screen".  Includes decode, queueing,
    batch-fill wait, H2D, compute, D2H, and egress.

    Thread-safe (recorded on the compute thread, read by stats() from
    anywhere).  Keeps the most recent `cap` samples: a full 143x9 volume
    is 1 287 sectors, so a long-lived service reports a sliding window
    over the latest ~78 volumes rather than growing without bound."""

    def __init__(self, cap: int = 100_000):
        import threading

        self.cap = cap
        self.count = 0
        self._samples: list = []
        self._lock = threading.Lock()

    def record(self, seconds: float) -> None:
        with self._lock:
            self.count += 1
            self._samples.append(seconds)
            if len(self._samples) > self.cap:
                del self._samples[: len(self._samples) - self.cap]

    def summary(self):
        """Percentile summary in ms, or None if nothing was recorded.

        Percentiles use the nearest-rank method (no interpolation): every
        reported value is a latency that actually happened."""
        with self._lock:
            if not self._samples:
                return None
            # only snapshot under the lock: sorting a full reservoir
            # (100k floats) would stall the compute thread's record()
            # and add jitter to the very latency being measured
            s = list(self._samples)
            count = self.count
        s.sort()
        def rank(p):
            return s[min(len(s) - 1, int(p * len(s)))]
        return {
            "count": count,
            "mean_ms": round(1e3 * sum(s) / len(s), 3),
            "p50_ms": round(1e3 * rank(0.50), 3),
            "p90_ms": round(1e3 * rank(0.90), 3),
            "p99_ms": round(1e3 * rank(0.99), 3),
            "max_ms": round(1e3 * s[-1], 3),
        }


@dataclass
class Throughput:
    """Sectors/s counter with rolling window, the reference's headline
    number (BASELINE.md)."""

    window: float = 10.0
    count: int = 0
    started: float = field(default_factory=time.perf_counter)
    # first/last completion timestamps survive window pruning: harnesses
    # use them for an active-span rate that excludes warmup and the
    # idle-drain tail (completion-to-completion)
    first_tick: float = 0.0
    last_tick: float = 0.0
    _events: list = field(default_factory=list)

    def tick(self, n: int = 1) -> None:
        now = time.perf_counter()
        if not self.first_tick:
            self.first_tick = now
        self.last_tick = now
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
