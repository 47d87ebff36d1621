"""TCP transport loopback tests (io/tcp.py — the working equivalent of the
reference's built-but-unused tcp.{h,cpp})."""

import threading

import numpy as np
import pytest

from wrp_tpu import oracle
from wrp_tpu.config import tiny_config
from wrp_tpu.io import codec
from wrp_tpu.io.tcp import (TcpEgress, TcpIngest, TcpProducer,
                            TcpResultConsumer)
from wrp_tpu.runtime import StreamingExecutor


@pytest.fixture()
def cfg():
    return tiny_config(m=32, n=16)


def _wire_sectors(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        iq = (rng.integers(-2048, 2048, cfg.sector_shape)
              + 1j * rng.integers(-2048, 2048, cfg.sector_shape))
        out.append((iq, codec.encode_iq(iq, cfg)))
    return out


def test_tcp_roundtrip_single_sector(cfg):
    ingest = TcpIngest(cfg, port=0, timeout_s=3.0)
    producer = TcpProducer(cfg, port=ingest.local_port)
    (iq, wire), = _wire_sectors(cfg, 1)
    producer.send_sector(wire, sector=5, elevation=1)
    buf, header = ingest.recv_sector()
    assert (header.sector, header.elevation) == (5, 1)
    assert bytes(buf) == wire
    producer.close()
    ingest.close()


def test_tcp_idle_timeout(cfg):
    ingest = TcpIngest(cfg, port=0, timeout_s=0.05)
    buf, header = ingest.recv_sector()
    assert buf is None and header is None
    ingest.close()


def test_tcp_producer_disconnect_then_reconnect(cfg):
    """A producer restart must not kill the ingest loop (the reference's
    blocking recv would hang forever; SURVEY.md section 5)."""
    ingest = TcpIngest(cfg, port=0, timeout_s=2.0)
    sectors = _wire_sectors(cfg, 2)

    p1 = TcpProducer(cfg, port=ingest.local_port)
    p1.send_sector(sectors[0][1], sector=0)
    buf, h = ingest.recv_sector()
    assert h.sector == 0 and bytes(buf) == sectors[0][1]
    p1.close()

    # EOF surfaces as one idle (None, None), then a new producer works
    assert ingest.recv_sector() == (None, None)
    p2 = TcpProducer(cfg, port=ingest.local_port)
    p2.send_sector(sectors[1][1], sector=1)
    buf, h = ingest.recv_sector()
    assert h.sector == 1 and bytes(buf) == sectors[1][1]
    p2.close()
    ingest.close()


def test_full_tcp_streaming_pipeline(cfg):
    """producer -> TcpIngest -> StreamingExecutor -> TcpEgress ->
    TcpResultConsumer over loopback, validated against the fp64 oracle."""
    n_sectors = 4
    sectors = _wire_sectors(cfg, n_sectors, seed=3)

    ingest = TcpIngest(cfg, port=0, timeout_s=2.0)
    consumer = TcpResultConsumer(cfg, port=0, timeout_s=5.0)
    egress = TcpEgress(cfg, port=consumer.local_port)

    ex = StreamingExecutor(cfg, transport=ingest, publish=egress,
                           batch=2, max_sectors=n_sectors)
    runner = threading.Thread(target=ex.run, daemon=True)
    runner.start()

    producer = TcpProducer(cfg, port=ingest.local_port)
    for k, (iq, wire) in enumerate(sectors):
        producer.send_sector(wire, sector=k, elevation=0)

    got = {}
    while len(got) < n_sectors * 2:
        item = consumer.recv()
        if item is None:
            break
        topic, sector, elevation, values = item
        got[(topic, sector)] = values
    runner.join(timeout=10)
    assert len(got) == n_sectors * 2, f"got {len(got)} frames"

    for k, (iq, _) in enumerate(sectors):
        zdb64, zdr64 = oracle.process_sector(iq, cfg)
        assert oracle.relative_l2(zdb64, got[(b"B", k)]) < 1e-4
        assert oracle.relative_l2(zdr64, got[(b"C", k)]) < 1e-4

    producer.close()
    ingest.close()
    egress.close()
    consumer.close()


def test_tcp_partial_frame_drops_connection(cfg):
    """A producer stalling mid-frame must not desync the stream: the
    connection is dropped and a fresh producer works."""
    import socket as socket_mod
    import struct

    ingest = TcpIngest(cfg, port=0, timeout_s=0.2)
    raw = socket_mod.create_connection(("127.0.0.1", ingest.local_port))
    # send a frame header promising more bytes than we deliver
    raw.sendall(struct.pack(">I", 1000) + b"only-a-little")
    buf, header = ingest.recv_sector()   # times out mid-frame -> drop
    assert buf is None and header is None
    raw.close()

    sectors = _wire_sectors(cfg, 1)
    p2 = TcpProducer(cfg, port=ingest.local_port)
    p2.send_sector(sectors[0][1], sector=3)
    buf, h = ingest.recv_sector()
    assert h.sector == 3 and bytes(buf) == sectors[0][1]
    p2.close()
    ingest.close()


def test_tcp_oversized_and_short_frames_drop_connection(cfg):
    """Hostile/corrupt frame lengths must not buffer gigabytes or feed a
    truncated payload into the codec (round-1 advisor): both drop the
    connection, after which a fresh producer works."""
    import socket as socket_mod
    import struct

    ingest = TcpIngest(cfg, port=0, timeout_s=0.5)

    # 1 GiB declared length: rejected immediately, nothing buffered
    raw = socket_mod.create_connection(("127.0.0.1", ingest.local_port))
    raw.sendall(struct.pack(">I", 1 << 30))
    buf, header = ingest.recv_sector()
    assert buf is None and header is None
    raw.close()

    # short-but-complete frame (valid length header, wrong payload size)
    raw2 = socket_mod.create_connection(("127.0.0.1", ingest.local_port))
    raw2.sendall(struct.pack(">I", 10) + b"x" * 10)
    buf, header = ingest.recv_sector()
    assert buf is None and header is None
    raw2.close()

    sectors = _wire_sectors(cfg, 1)
    p2 = TcpProducer(cfg, port=ingest.local_port)
    p2.send_sector(sectors[0][1], sector=5)
    buf, h = ingest.recv_sector()
    assert h.sector == 5 and bytes(buf) == sectors[0][1]
    p2.close()
    ingest.close()


def test_tcp_ingest_stats_uniform(cfg):
    """TCP carries the same IngestStats surface as UDP/ZMQ: sectors,
    timeouts, and dropped frames are all visible."""
    import socket as socket_mod
    import struct

    ingest = TcpIngest(cfg, port=0, timeout_s=0.1)
    assert ingest.stats.sectors == 0
    buf, _ = ingest.recv_sector()           # idle
    assert buf is None and ingest.stats.timeouts == 1

    raw = socket_mod.create_connection(("127.0.0.1", ingest.local_port))
    raw.sendall(struct.pack(">I", 10) + b"x" * 10)   # short frame
    ingest.recv_sector()
    assert ingest.stats.dropped_sectors == 1
    raw.close()

    (iq, wire), = _wire_sectors(cfg, 1)
    p = TcpProducer(cfg, port=ingest.local_port)
    p.send_sector(wire, sector=1)
    buf, h = ingest.recv_sector()
    assert bytes(buf) == wire
    assert ingest.stats.sectors == 1
    p.close()
    ingest.close()


def test_tcp_result_consumer_short_frame_survives(cfg):
    """An undersized result frame (valid length header, < topic+v2 header
    bytes) must drop the connection, not crash the consumer."""
    import socket as socket_mod
    import struct

    from wrp_tpu.io.tcp import TcpResultConsumer

    consumer = TcpResultConsumer(cfg, port=0, timeout_s=1.0)
    raw = socket_mod.create_connection(("127.0.0.1", consumer.local_port))
    raw.sendall(struct.pack(">I", 4) + b"\x00" * 4)   # too short for v2
    assert consumer.recv() is None                     # dropped, no crash
    raw.close()

    # a fresh producer-side connection still works
    from wrp_tpu.io import frames

    raw2 = socket_mod.create_connection(("127.0.0.1", consumer.local_port))
    body = b"B" + frames.pack_result_v2(
        3, 1, np.arange(cfg.num_output_bins, dtype=np.float32))
    raw2.sendall(struct.pack(">I", len(body)) + body)
    topic, sector, elevation, values = consumer.recv()
    assert (topic, sector, elevation) == (b"B", 3, 1)
    raw2.close()
    consumer.close()


def test_tcp_multifeed_consolidation(cfg):
    """Multi-feed consolidation over TCP (cli stream --feed-port for the
    tcp transport): two framed-stream feeds with different data under the
    same sector labels, per-feed volumes pinned to their own oracles."""
    from wrp_tpu.runtime import VolumeScan

    n_per_feed = 2
    data = [_wire_sectors(cfg, n_per_feed, seed=30 + f) for f in range(2)]
    ingests = [TcpIngest(cfg, port=0, timeout_s=3.0) for _ in range(2)]
    vols = [VolumeScan(cfg, None) for _ in range(2)]
    ex = StreamingExecutor(cfg, transport=ingests, volume=vols,
                           batch=2, max_sectors=n_per_feed)
    res = []
    runner = threading.Thread(target=lambda: res.append(ex.run()),
                              daemon=True)
    runner.start()
    producers = [TcpProducer(cfg, port=ing.local_port) for ing in ingests]
    for k in range(n_per_feed):
        for f in range(2):
            producers[f].send_sector(data[f][k][1], sector=k, elevation=0)
    runner.join(timeout=60)
    assert res and res[0]["processed_sectors"] == 2 * n_per_feed
    assert [fs["processed_sectors"] for fs in res[0]["feeds"]] == [2, 2]
    for f in range(2):
        for k in range(n_per_feed):
            assert vols[f].coverage[k, 0]
            zdb64, _ = oracle.process_sector(data[f][k][0], cfg)
            assert oracle.relative_l2(zdb64, vols[f].data[0, :, k, 0]) < 1e-4
    for x in ingests + producers:
        x.close()
