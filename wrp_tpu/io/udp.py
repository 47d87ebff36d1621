"""UDP ingest/egress — wire-compatible with the reference v1 pipeline.

Reference behaviour (read_single.cc:125-148, udpbroadcast.cpp):
  * ingest: one sector = m datagrams x (bytes_per_sample * n) bytes on
    port 19001, strictly in row order, blocking recv with no timeout;
  * egress: zdb/zdr frames broadcast to ports 19002/19003.

This implementation fixes the reference's silent-corruption failure modes
(SURVEY.md section 5): configurable receive timeout, sector resynchronisation
on drops (count-based for bare v1 datagrams, header-based when the producer
uses frames.IngestHeader), and drop accounting.
"""

from __future__ import annotations

import socket
from typing import Optional

import numpy as np

from ..config import RadarConfig, DEFAULT_CONFIG
from . import frames
from .stats import IngestStats

import logging

log = logging.getLogger("wrp_tpu")


class UdpIngest:
    """Reassembles sectors from per-pulse-row datagrams.

    With bare v1 datagrams, rows are assumed in order (the reference's
    contract); a timeout mid-sector drops the partial sector and resyncs.
    With extended headers (frames.IngestHeader) rows are placed by index and
    loss is detected exactly.
    """

    def __init__(
        self,
        cfg: RadarConfig = DEFAULT_CONFIG,
        port: int | None = None,
        host: str = "",
        timeout_s: Optional[float] = None,
        rcvbuf_bytes: int = 1 << 27,
        native: Optional[bool] = None,
        reuse_port: bool = False,
    ):
        """native: use the C++ GIL-free reassembly loop (native/ingest.cpp).
        None = auto (native when the library builds).

        reuse_port: bind with SO_REUSEPORT so several processes can share
        ONE broadcast wire on the same port (pulse-shard workers
        co-hosted on a box; broadcast datagrams are delivered to every
        bound socket).  OFF by default: for unicast traffic the kernel
        hash-routes each sender to ONE of the bound sockets, so an
        accidental port collision between two unrelated feeds would
        leave one silently idle instead of failing loudly with
        EADDRINUSE (advisor r4)."""
        self.cfg = cfg
        self.port = port if port is not None else cfg.udp_ingest_port
        self.stats = IngestStats()
        self._row_bytes = cfg.datagram_nbytes
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        if reuse_port:
            try:
                self._sock.setsockopt(socket.SOL_SOCKET,
                                      socket.SO_REUSEPORT, 1)
            except (OSError, AttributeError):
                pass
        try:
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                                  rcvbuf_bytes)
        except OSError:
            pass
        # Linux silently clamps SO_RCVBUF to net.core.rmem_max; an
        # undersized buffer is the reference's silent datagram-loss mode,
        # so make the clamp visible.  getsockopt reports 2x the effective
        # size, so the un-clamped reading would be 2x the request —
        # comparing against the raw request would miss clamps between
        # half and the full request.
        got = self._sock.getsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF)
        if got < 2 * rcvbuf_bytes:
            log.warning(
                "UDP receive buffer clamped to %.1f MB (requested %.0f MB);"
                " raise net.core.rmem_max to avoid burst drops",
                got / 2 / 1e6, rcvbuf_bytes / 1e6)
        self._sock.bind((host, self.port))
        self._native = None
        if native is None or native:
            try:
                from ..native import ingest_native

                self._native = ingest_native
            except ImportError:
                if native:
                    raise
        if self._native is not None:
            # the C++ loop uses SO_RCVTIMEO on a blocking socket
            self._sock.setblocking(True)
            # C++ treats timeout_ms <= 0 as block-forever; a sub-ms
            # timeout must round UP, not silently disable itself
            self._timeout_ms = (max(1, int(timeout_s * 1000))
                                if timeout_s is not None else -1)
            self._nstats = np.zeros(5, np.int64)
            self._nhdr = np.zeros(3, np.int32)
        else:
            self._sock.settimeout(timeout_s)
        # Full-datagram scratch (matches the native path's 64 KiB): a
        # right-sized buffer would make recv_into silently TRUNCATE an
        # oversized datagram (wrong-geometry producer, corrupt length)
        # to exactly row_bytes of payload and accept it as a valid row —
        # the silent-corruption mode this module exists to prevent.
        # Oversized rows must instead fail the length check and count
        # as dropped datagrams.
        self._scratch = bytearray(65536)

    @property
    def local_port(self) -> int:
        return self._sock.getsockname()[1]

    def recv_sector(self, out: bytearray | None = None):
        """Receive one sector.

        Returns (buffer, header | None) where buffer is the raw
        sector_nbytes_wire byte payload and header carries (sector,
        elevation) when the producer sent extended frames.  Returns
        (None, None) on timeout with no data (idle).  Raises TimeoutError
        if a sector is partially received and then the stream stalls.
        """
        cfg = self.cfg
        m = cfg.num_range_cells
        buf = out if out is not None else bytearray(cfg.sector_nbytes_wire)
        if self._native is not None:
            return self._recv_sector_native(buf, m)
        view = memoryview(buf)
        first_header = None
        filled = bytearray(m)   # unique-row tracking (extended headers)
        rows = 0
        while rows < m:
            try:
                nbytes = self._sock.recv_into(self._scratch)
            except socket.timeout:
                self.stats.timeouts += 1
                if rows == 0:
                    return None, None
                # mid-sector stall: drop partial sector, stay alive
                self.stats.dropped_sectors += 1
                self.stats.dropped_datagrams += m - rows
                raise TimeoutError(
                    f"sector stalled after {rows}/{m} rows"
                ) from None
            self.stats.datagrams += 1
            header, payload = frames.try_unpack_ingest_row(
                bytes(self._scratch[:nbytes])
            )
            if len(payload) != self._row_bytes:
                self.stats.dropped_datagrams += 1
                continue
            if header is not None:
                if first_header is None:
                    first_header = header
                elif (header.sector != first_header.sector
                      or header.elevation != first_header.elevation):
                    # producer moved on: we lost the tail of this sector
                    self.stats.dropped_sectors += 1
                    self.stats.dropped_datagrams += m - rows
                    buf[:] = b"\x00" * len(buf)
                    first_header = header
                    filled = bytearray(m)
                    rows = 0
                row_idx = header.row
                if not (0 <= row_idx < m):
                    self.stats.dropped_datagrams += 1
                    continue
                # UDP permits duplicates: count UNIQUE rows, not
                # datagrams, or a dup + one lost row would "complete" the
                # sector with a silent zero-filled hole
                if filled[row_idx]:
                    self.stats.duplicate_datagrams += 1
                    view[row_idx * self._row_bytes:
                         (row_idx + 1) * self._row_bytes] = payload
                    continue
                filled[row_idx] = 1
            else:
                row_idx = rows  # bare v1 wire: rows arrive in order
            view[row_idx * self._row_bytes:(row_idx + 1) * self._row_bytes] = payload
            rows += 1
        self.stats.sectors += 1
        return buf, first_header

    def _recv_sector_native(self, buf, m):
        """GIL-free C++ reassembly (native/ingest.cpp) with the same
        return/resync semantics as the Python loop."""
        st = self._nstats
        before = st.copy()
        rc = self._native.recv_sector(
            self._sock.fileno(), self._timeout_ms, buf, m, self._row_bytes,
            st, self._nhdr,
        )
        d = st - before
        self.stats.datagrams += int(d[0])
        self.stats.dropped_datagrams += int(d[1])
        self.stats.dropped_sectors += int(d[2])
        self.stats.timeouts += int(d[3])
        self.stats.duplicate_datagrams += int(d[4])
        if rc == 0:
            return None, None
        if rc == -1:
            raise TimeoutError("sector stalled mid-receive")
        if rc == -2:
            raise OSError("native ingest socket error")
        self.stats.sectors += 1
        header = None
        if self._nhdr[0]:
            header = frames.IngestHeader(int(self._nhdr[1]),
                                         int(self._nhdr[2]), row=0)
        return buf, header

    def close(self):
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class UdpEgress:
    """Broadcast result frames like the reference's udpclient
    (udpbroadcast.cpp:15-43): one socket per product port."""

    def __init__(self, cfg: RadarConfig = DEFAULT_CONFIG,
                 zdb_port: int | None = None, zdr_port: int | None = None,
                 host: str = "127.0.0.1", broadcast: bool = False,
                 extended: bool = False):
        """extended: emit v1x frames (frames.RESULT_MAGIC header carrying
        the elevation) instead of bare v1 — opt-in, mirroring the ingest
        `--headers` option, so a UDP consumer can reconstruct the full
        multi-elevation volume; off by default for reference wire parity."""
        self.cfg = cfg
        self.host = "255.255.255.255" if broadcast else host
        self.zdb_port = zdb_port if zdb_port is not None else cfg.udp_zdb_port
        self.zdr_port = zdr_port if zdr_port is not None else cfg.udp_zdr_port
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        if broadcast:
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_BROADCAST, 1)
        self.extended = extended
        # distinct bound signatures so the executor's v2-then-v1 publish
        # detection (TypeError fallback) picks the right one
        self.send = self._send_v1x if extended else self._send_v1

    def _send_v1(self, sector: int, zdb: np.ndarray,
                 zdr: np.ndarray) -> None:
        """v1 frame: [sector:int16 BE][m/2 float32 BE]
        (read_single.cc:510-520)."""
        self._sock.sendto(frames.pack_result_v1(sector, zdb),
                          (self.host, self.zdb_port))
        self._sock.sendto(frames.pack_result_v1(sector, zdr),
                          (self.host, self.zdr_port))

    def _send_v1x(self, sector: int, elevation: int, zdb: np.ndarray,
                  zdr: np.ndarray) -> None:
        """v1x frame (see frames.pack_result_v1x): v1 plus elevation."""
        self._sock.sendto(frames.pack_result_v1x(sector, elevation, zdb),
                          (self.host, self.zdb_port))
        self._sock.sendto(frames.pack_result_v1x(sector, elevation, zdr),
                          (self.host, self.zdr_port))

    def close(self):
        self._sock.close()


class UdpProducer:
    """Replays sector byte streams as v1 row datagrams (the external
    producer process of the reference's localhost test topology,
    SURVEY.md section 4.5)."""

    def __init__(self, cfg: RadarConfig = DEFAULT_CONFIG,
                 host: str = "127.0.0.1", port: int | None = None,
                 extended_headers: bool = False,
                 rows_per_burst: int = 64, burst_gap_s: float = 1e-3):
        """rows_per_burst/burst_gap_s: datagram pacing.  Kernel receive
        buffers are typically capped well below one sector's 6.3 MB
        (net.core.rmem_max is 4 MB here), so an unpaced sector burst
        overruns the receiver and loses datagrams — the reference's silent
        corruption mode, our detected-drop mode.  Pacing bounds the burst;
        set rows_per_burst=0 to disable."""
        self.cfg = cfg
        self.addr = (host, port if port is not None else cfg.udp_ingest_port)
        self.extended = extended_headers
        self.rows_per_burst = rows_per_burst
        self.burst_gap_s = burst_gap_s
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # the reference producer sends to INADDR_BROADCAST
        # (udpbroadcast.cpp:30): with a broadcast host (e.g.
        # 127.255.255.255 on loopback) EVERY listener on the port gets
        # every sector — the one-wire fan-out the pulse-shard mode rides
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_BROADCAST, 1)

    def send_sector(self, wire: bytes, sector: int = 0,
                    elevation: int = 0) -> None:
        import time

        cfg = self.cfg
        rb = cfg.datagram_nbytes
        for row in range(cfg.num_range_cells):
            payload = wire[row * rb:(row + 1) * rb]
            if self.extended:
                payload = frames.pack_ingest_row(
                    frames.IngestHeader(sector, elevation, row), payload
                )
            self._sock.sendto(payload, self.addr)
            if (self.rows_per_burst and self.burst_gap_s
                    and (row + 1) % self.rows_per_burst == 0):
                time.sleep(self.burst_gap_s)

    def close(self):
        self._sock.close()
