"""Streaming executor: the TPU-native equivalent of the reference's v1
stream-cascade pipeline (gpu_1fp_streamcasc.cu:485-737).

The reference's software pipeline overlapped, per sector: host UDP ingest of
sector k+1, GPU compute of sector k on a round-robin CUDA stream, and D2H of
sector k-1's 4 KB result.  Here the same overlap falls out of a two-thread
design with JAX's async dispatch:

  ingest thread:  transport recv -> native/numpy decode -> planar queue
  compute thread: batch up to `batch` sectors -> device_put -> jit chain
                  -> D2H fetch -> egress + volume-scan accumulation

While the device runs batch k, the ingest thread is already decoding batch
k+1 (the reference's proven bottleneck — SURVEY.md section 6 shows host
input dominated every GPU variant).  Batching replaces CUDA streams: one
dispatch of [B, C, 2, m, n] keeps the chip busier than round-robin
single-sector launches ever could.

Adds what the reference lacked (SURVEY.md section 5): recv timeouts with
drop-and-resync recovery, sector/elevation tracking, volume-scan
checkpointing, per-stage timers, and a debug sync-every-batch mode.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Callable, Optional

import numpy as np

from ..config import RadarConfig, DEFAULT_CONFIG
from ..pipeline import SectorProcessor
from ..io import codec
from .metrics import StageTimers, Throughput, log
from .volume import VolumeScan


@dataclasses.dataclass
class SectorTask:
    planar: np.ndarray          # [C, 2, m, n] float32
    sector: int
    elevation: int


class StreamingExecutor:
    """Pull sectors from a transport, process in batches, publish products.

    transport: object with `recv_sector() -> (bytes | None, header | None)`
               (UdpIngest) or `recv_sector() -> bytes | None` (ZmqIngest).
    publish:   callable(sector, elevation, zdb, zdr) or an egress object
               with `.send(...)` — v1 egress takes (sector, zdb, zdr),
               v2 takes (sector, elevation, zdb, zdr); both are detected.
    """

    def __init__(
        self,
        cfg: RadarConfig = DEFAULT_CONFIG,
        transport=None,
        publish: Optional[Callable] = None,
        batch: int = 8,
        method: str = "mxu",
        queue_depth: int = 4,
        debug_sync: bool = False,
        volume: Optional[VolumeScan] = None,
        max_sectors: Optional[int] = None,
        idle_limit: Optional[int] = None,
        processor: Optional[Callable] = None,
        lockstep: bool = False,
    ):
        """idle_limit: stop after this many consecutive idle receive
        timeouts (None = listen forever, the service default).

        processor: override the compiled batch step (e.g.
        parallel.multihost.MultiHostProcessor.step_local for lock-step
        multi-host streaming); default builds a local SectorProcessor.

        lockstep: wait for FULL batches (except at end-of-stream) so every
        host in a multi-host mesh issues the same number of collective
        steps for the same sector count."""
        self.cfg = cfg
        self.transport = transport
        self.publish = publish
        self.batch = batch
        self.debug_sync = debug_sync
        self.max_sectors = max_sectors
        self.idle_limit = idle_limit
        self.lockstep = lockstep
        self.volume = volume
        self.timers = StageTimers()
        self.throughput = Throughput()
        if processor is not None:
            self.processor = processor
            self._decode_radix = 0          # external step: natural f32
        elif method == "pallas":
            # fused-kernel fast path: compact int16 feed, rows decoded
            # straight into radix-DIT order (no on-device permutation)
            self.processor = SectorProcessor(cfg, method=method,
                                             layout="radix")
            self._decode_radix = self.processor.input_radix
        else:
            self.processor = SectorProcessor(cfg, method=method)
            self._decode_radix = 0
        self._queue: "queue.Queue[Optional[SectorTask]]" = queue.Queue(
            maxsize=queue_depth * batch
        )
        self._stop = threading.Event()
        self._ingest_error: Optional[BaseException] = None
        self.bad_headers = 0
        # reference counters (rpv2.cu:46-51, advance() :572-579)
        self._sector = 0
        self._elevation = 0

    # ------------------------------------------------------------------
    # ingest side
    # ------------------------------------------------------------------

    def _advance(self):
        self._sector = (self._sector + 1) % self.cfg.num_sectors
        if self._sector == 0:
            self._elevation = (self._elevation + 1) % self.cfg.num_elevations

    def _ingest_loop(self):
        received = 0
        idle = 0
        try:
            while not self._stop.is_set():
                if self.max_sectors is not None and received >= self.max_sectors:
                    break
                with self.timers.time("ingest/recv"):
                    try:
                        got = self.transport.recv_sector()
                    except TimeoutError as e:
                        log.warning("dropped sector: %s", e)
                        self._advance()
                        continue
                if isinstance(got, tuple):
                    wire, header = got
                else:
                    wire, header = got, None
                if wire is None:
                    idle += 1
                    if self.idle_limit is not None and idle >= self.idle_limit:
                        log.info("idle limit reached (%d timeouts), stopping",
                                 idle)
                        break
                    continue
                idle = 0
                if header is not None:
                    sector, elevation = header.sector, header.elevation
                    if not (0 <= sector < self.cfg.num_sectors
                            and 0 <= elevation < self.cfg.num_elevations):
                        # a corrupt wire header must neither kill the run
                        # (volume indexing / result packing would raise)
                        # nor change this host's sector count (lock-step
                        # multi-host needs identical step sequences):
                        # clamp into range and account for it
                        sector %= self.cfg.num_sectors
                        elevation %= self.cfg.num_elevations
                        self.bad_headers += 1
                        log.warning("bad wire header clamped to (%d, %d)",
                                    sector, elevation)
                    self._sector, self._elevation = sector, elevation
                else:
                    sector, elevation = self._sector, self._elevation
                with self.timers.time("ingest/decode"):
                    if self._decode_radix:
                        planar = codec.decode_iq_i16(
                            wire, self.cfg, radix=self._decode_radix)
                    else:
                        planar = codec.decode_iq(wire, self.cfg)
                task = SectorTask(planar, sector, elevation)
                while not self._stop.is_set():
                    try:
                        self._queue.put(task, timeout=0.2)
                        break
                    except queue.Full:
                        continue  # shutdown must not hang on a full queue
                self._advance()
                received += 1
        except BaseException as e:  # surface into run()
            self._ingest_error = e
        finally:
            try:
                self._queue.put_nowait(None)
            except queue.Full:
                pass  # consumer is gone; run() is already unwinding

    # ------------------------------------------------------------------
    # compute side
    # ------------------------------------------------------------------

    def _drain_batch(self):
        """Collect up to `batch` queued sectors (at least one, else None)."""
        tasks = []
        item = self._queue.get()
        if item is None:
            return None
        tasks.append(item)
        while len(tasks) < self.batch:
            try:
                item = (self._queue.get() if self.lockstep
                        else self._queue.get_nowait())
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-signal EOF for next round
                break
            tasks.append(item)
        return tasks

    def _process_batch(self, tasks):
        # Pad to the fixed batch shape: one compiled executable for the
        # whole stream (a mid-stream recompile stalls ingest long enough
        # to overflow the receive buffer).
        planar = np.stack([t.planar for t in tasks])
        if len(tasks) < self.batch:
            pad = np.zeros((self.batch - len(tasks), *planar.shape[1:]),
                           planar.dtype)
            planar = np.concatenate([planar, pad])
        with self.timers.time("compute/dispatch"):
            zdb, zdr = self.processor(planar)
        with self.timers.time("compute/fetch"):
            zdb = np.asarray(zdb)[: len(tasks)]
            zdr = np.asarray(zdr)[: len(tasks)]
        if self.debug_sync:
            # rpv2's gpuErrchk-after-every-launch as a flag, not a hardcode
            # (rpv2.cu:422-490): validate numerics every batch.
            bad = ~np.isfinite(zdb[:, 1:])
            if bad.any():
                log.error("debug_sync: %d non-finite zdb bins", int(bad.sum()))
        for k, t in enumerate(tasks):
            if self.volume is not None:
                self.volume.store(t.sector, t.elevation, zdb[k], zdr[k])
            if self.publish is not None:
                with self.timers.time("egress/send"):
                    self._publish_one(t, zdb[k], zdr[k])
        self.throughput.tick(len(tasks))

    def _publish_one(self, t: SectorTask, zdb, zdr):
        pub = self.publish
        if callable(pub) and not hasattr(pub, "send"):
            pub(t.sector, t.elevation, zdb, zdr)
            return
        try:
            pub.send(t.sector, t.elevation, zdb, zdr)   # v2 signature
        except TypeError:
            pub.send(t.sector, zdb, zdr)                # v1 signature

    # ------------------------------------------------------------------

    def warmup(self) -> None:
        """Compile the chain before ingest starts (the reference built all
        cuFFT plans up front, rpv2.cu:312-341; a first-batch compile stall
        here would overflow the UDP receive buffer and drop sectors)."""
        c, m, n = self.cfg.sector_shape
        dtype = np.int16 if self._decode_radix else np.float32
        zeros = np.zeros((self.batch, c, 2, m, n), dtype)
        np.asarray(self.processor(zeros)[0])

    def run(self) -> dict:
        """Blocking steady-state loop; returns a stats summary."""
        with self.timers.time("compute/warmup_compile"):
            self.warmup()
        log.info("warmup complete, ingest starting")
        ingest = threading.Thread(target=self._ingest_loop, daemon=True,
                                  name="wrp-ingest")
        ingest.start()
        processed = 0
        next_progress = 100
        try:
            while True:
                tasks = self._drain_batch()
                if tasks is None:
                    break
                self._process_batch(tasks)
                processed += len(tasks)
                if processed >= next_progress:
                    # the reference's sector-id progress prints
                    # (gpu_1fp_streamcasc.cu:658), rate-limited; the
                    # rolling-window rate excludes the warmup compile
                    log.info("processed %d sectors (%.1f/s)", processed,
                             self.throughput.rate())
                    while processed >= next_progress:
                        next_progress += 100
        except KeyboardInterrupt:
            log.info("interrupted after %d sectors, shutting down",
                     processed)
        finally:
            self._stop.set()
            ingest.join(timeout=5)
        if self._ingest_error is not None:
            raise self._ingest_error
        return self.stats(processed)

    def stop(self):
        self._stop.set()

    def stats(self, processed: int) -> dict:
        return {
            "processed_sectors": processed,
            "bad_headers": self.bad_headers,
            "sectors_per_second": round(self.throughput.overall(), 2),
            "timers": self.timers.summary(),
            "transport": dataclasses.asdict(self.transport.stats)
            if hasattr(self.transport, "stats") else {},
        }
