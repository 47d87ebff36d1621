"""Loopback streaming integration tests over real sockets.

The TPU-framework formalisation of the reference's localhost test topology:
producer process -> processor -> consumers over 127.0.0.1
(read_single.cc:125-127; rpv2.cu tcp://localhost:5563/5564, SURVEY.md
section 4.5).  Uses ephemeral ports so tests don't collide.
"""

import socket
import threading

import numpy as np
import pytest

from wrp_tpu import oracle
from wrp_tpu.config import tiny_config
from wrp_tpu.io import codec, frames
from wrp_tpu.io.udp import UdpIngest, UdpEgress, UdpProducer
from wrp_tpu.runtime import StreamingExecutor


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


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


@pytest.mark.parametrize("native", [False, True])
def test_udp_loopback_single_sector(cfg, native):
    ingest = UdpIngest(cfg, port=0, timeout_s=2.0, native=native)
    producer = UdpProducer(cfg, port=ingest.local_port)
    (iq, wire), = _wire_sectors(cfg, 1)
    producer.send_sector(wire)
    buf, header = ingest.recv_sector()
    assert header is None
    assert bytes(buf) == wire
    planar = codec.decode_iq(bytes(buf), cfg)
    np.testing.assert_array_equal(codec.to_complex(planar),
                                  iq.astype(np.complex64))
    ingest.close()
    producer.close()


@pytest.mark.parametrize("native", [False, True])
def test_udp_extended_headers_and_reorder(cfg, native):
    """Rows carrying explicit indices are placed correctly even when sent
    out of order — impossible in the reference's bare format."""
    ingest = UdpIngest(cfg, port=0, timeout_s=2.0, native=native)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    (iq, wire), = _wire_sectors(cfg, 1)
    rb = cfg.datagram_nbytes
    rows = list(range(cfg.num_range_cells))
    rows[0], rows[1] = rows[1], rows[0]  # swap first two rows on the wire
    for row in rows:
        payload = frames.pack_ingest_row(
            frames.IngestHeader(9, 2, row), wire[row * rb:(row + 1) * rb])
        sock.sendto(payload, ("127.0.0.1", ingest.local_port))
    buf, header = ingest.recv_sector()
    assert (header.sector, header.elevation) == (9, 2)
    assert bytes(buf) == wire  # reassembled in correct order
    ingest.close()
    sock.close()


@pytest.mark.parametrize("native", [False, True])
def test_udp_oversized_datagram_rejected_not_truncated(cfg, native):
    """A datagram larger than a row (wrong-geometry producer, corrupt
    length) must be DROPPED, not kernel-truncated to exactly row_bytes
    and accepted as a valid row — the silent-corruption mode the module
    exists to prevent.  Both paths must agree (the Python path used a
    right-sized scratch buffer that made recv_into truncate)."""
    ingest = UdpIngest(cfg, port=0, timeout_s=0.5, native=native)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    (_, wire), = _wire_sectors(cfg, 1)
    rb = cfg.datagram_nbytes
    m = cfg.num_range_cells
    # row 0 arrives oversized (extra trailing bytes), then the full
    # sector arrives correctly: the oversized datagram must count as a
    # drop and the clean sector must still complete with correct bytes
    sock.sendto(wire[:rb] + b"XTRA", ("127.0.0.1", ingest.local_port))
    for row in range(m):
        sock.sendto(frames.pack_ingest_row(
            frames.IngestHeader(3, 1, row), wire[row * rb:(row + 1) * rb]),
            ("127.0.0.1", ingest.local_port))
    buf, header = ingest.recv_sector()
    assert bytes(buf) == wire
    assert (header.sector, header.elevation) == (3, 1)
    assert ingest.stats.dropped_datagrams >= 1
    ingest.close()
    sock.close()


def test_throughput_rate_prunes_stale_events():
    """rate() after an idle gap longer than the window must report ~0,
    not replay the last burst (pruning used to happen only in tick())."""
    from wrp_tpu.runtime.metrics import Throughput

    tp = Throughput(window=0.05)
    tp.tick(1000)
    import time as _t

    _t.sleep(0.12)
    assert tp.rate() == 0.0
    assert tp.count == 1000        # the overall counter is untouched


def test_latency_stats_percentiles():
    """Nearest-rank percentiles over the bounded reservoir: every
    reported value is a latency that actually happened, and the cap
    evicts oldest-first while the count keeps the lifetime total."""
    from wrp_tpu.runtime.metrics import LatencyStats

    ls = LatencyStats(cap=5)
    assert ls.summary() is None
    for v in (0.010, 0.020, 0.030, 0.040, 0.100):
        ls.record(v)
    s = ls.summary()
    assert s["count"] == 5
    assert s["p50_ms"] == 30.0
    assert s["p90_ms"] == 100.0
    assert s["max_ms"] == 100.0
    assert s["mean_ms"] == 40.0
    ls.record(0.050)          # evicts the 10 ms sample (cap=5)
    s = ls.summary()
    assert s["count"] == 6    # lifetime count, not reservoir size
    assert s["p50_ms"] == 40.0 and s["max_ms"] == 100.0


def test_streaming_reports_end_to_end_latency(cfg):
    """Every processed sector contributes one wire-arrival→published
    latency sample (decode + queue + batch wait + H2D + compute + D2H),
    and the stats summary reports ordered percentiles."""
    n_sectors = 5
    sectors = _wire_sectors(cfg, n_sectors, seed=11)
    ingest = UdpIngest(cfg, port=0, timeout_s=2.0)
    ex = StreamingExecutor(cfg, transport=ingest, publish=None,
                           batch=2, max_sectors=n_sectors)
    runner = threading.Thread(target=ex.run, daemon=True)
    runner.start()
    producer = UdpProducer(cfg, port=ingest.local_port)
    for _, wire in sectors:
        producer.send_sector(wire)
    runner.join(timeout=20)
    lat = ex.stats(n_sectors)["latency_ms"]
    assert lat["count"] == n_sectors
    assert 0 < lat["p50_ms"] <= lat["p90_ms"] <= lat["p99_ms"] <= lat["max_ms"]
    ingest.close()
    producer.close()


def test_executor_empty_publish_list_means_no_publish(cfg):
    """publish=[] must behave like publish=None (no egress), not crash
    the first completed batch with an IndexError."""
    ex = StreamingExecutor(cfg, transport=None, publish=[], batch=1)
    c, m, n = cfg.sector_shape
    from wrp_tpu.runtime.executor import SectorTask

    done = ex._process_batch(
        [SectorTask(np.zeros((c, 2, m, n), np.float32), 0, 0)])
    assert done == 1


@pytest.mark.parametrize("native", [False, True])
def test_udp_timeout_returns_idle(cfg, native):
    ingest = UdpIngest(cfg, port=0, timeout_s=0.05, native=native)
    buf, header = ingest.recv_sector()
    assert buf is None and header is None
    assert ingest.stats.timeouts == 1
    ingest.close()


@pytest.mark.parametrize("native", [False, True])
def test_udp_partial_sector_drop(cfg, native):
    """A producer dying mid-sector must raise (and count a drop), not hang
    forever like the reference's blocking recvfrom."""
    ingest = UdpIngest(cfg, port=0, timeout_s=0.1, native=native)
    producer = UdpProducer(cfg, port=ingest.local_port)
    (_, wire), = _wire_sectors(cfg, 1)
    rb = cfg.datagram_nbytes
    for row in range(4):  # only 4 of m rows
        producer._sock.sendto(wire[row * rb:(row + 1) * rb], producer.addr)
    with pytest.raises(TimeoutError):
        ingest.recv_sector()
    assert ingest.stats.dropped_sectors == 1
    ingest.close()
    producer.close()


@pytest.mark.parametrize("native", [False, True])
def test_udp_duplicate_plus_lost_row_detected(cfg, native):
    """UDP permits duplicate datagrams: a dup of one row plus a lost row
    must NOT complete the sector (m datagrams arrived but only m-1 unique
    rows) — it must stall out as a recorded drop.  Round-1 VERDICT weak
    item 1: the old datagram-count accounting silently passed a sector
    with a zero-filled hole here."""
    ingest = UdpIngest(cfg, port=0, timeout_s=0.2, native=native)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    (_, wire), = _wire_sectors(cfg, 1)
    rb = cfg.datagram_nbytes
    m = cfg.num_range_cells
    for row in list(range(m - 1)) + [0]:   # last row lost, row 0 duplicated
        payload = frames.pack_ingest_row(
            frames.IngestHeader(1, 0, row), wire[row * rb:(row + 1) * rb])
        sock.sendto(payload, ("127.0.0.1", ingest.local_port))
    with pytest.raises(TimeoutError):
        ingest.recv_sector()
    assert ingest.stats.duplicate_datagrams == 1
    assert ingest.stats.dropped_sectors == 1
    ingest.close()
    sock.close()


def test_zmq_short_body_counts_as_drop(cfg):
    """ZMQ ingest drops were invisible in round 1 (no stats object): a
    short body must count as a dropped sector in the uniform IngestStats
    AND raise like UdpIngest's lost-sector path, so the executor advances
    the positional counter — returning None here looked idle and shifted
    every later sector of a header-less feed one label early."""
    zmq = pytest.importorskip("zmq")  # noqa: F841
    from wrp_tpu.io.zmq_io import ZmqIngest, ZmqProducer

    port = _free_port()
    producer = ZmqProducer(cfg, endpoint=f"tcp://127.0.0.1:{port}")
    ingest = ZmqIngest(cfg, endpoint=f"tcp://127.0.0.1:{port}",
                       timeout_ms=2000)
    import time

    time.sleep(0.3)  # PUB/SUB join
    producer.send_sector(b"\x00" * 16)          # short body
    with pytest.raises(TimeoutError, match="short zmq body"):
        ingest.recv_sector()
    assert ingest.stats.dropped_sectors == 1
    (_, wire), = _wire_sectors(cfg, 1)
    producer.send_sector(wire)                   # full body still works
    assert ingest.recv_sector() == (wire, None)  # 2-part wire: no labels
    assert ingest.stats.sectors == 1
    producer.close()
    ingest.close()


def test_full_udp_streaming_pipeline(cfg):
    """producer -> UdpIngest -> StreamingExecutor -> UdpEgress -> consumer,
    all over loopback; results validated against the fp64 oracle."""
    n_sectors = 6
    sectors = _wire_sectors(cfg, n_sectors, seed=4)

    ingest = UdpIngest(cfg, port=0, timeout_s=2.0)
    # consumer sockets on ephemeral ports
    zdb_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    zdb_sock.bind(("127.0.0.1", 0))
    zdb_sock.settimeout(5.0)
    zdr_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    zdr_sock.bind(("127.0.0.1", 0))
    zdr_sock.settimeout(5.0)
    egress = UdpEgress(cfg, zdb_port=zdb_sock.getsockname()[1],
                       zdr_port=zdr_sock.getsockname()[1])

    ex = StreamingExecutor(cfg, transport=ingest, publish=egress,
                           batch=3, max_sectors=n_sectors)
    runner = threading.Thread(target=ex.run, daemon=True)
    runner.start()

    producer = UdpProducer(cfg, port=ingest.local_port)
    for iq, wire in sectors:
        producer.send_sector(wire)

    results = {}
    for _ in range(n_sectors):
        buf, _ = zdb_sock.recvfrom(65536)
        sector, zdb = frames.unpack_result_v1(buf)
        buf, _ = zdr_sock.recvfrom(65536)
        sector2, zdr = frames.unpack_result_v1(buf)
        assert sector == sector2
        results[sector] = (zdb, zdr)
    runner.join(timeout=10)
    assert len(results) == n_sectors

    for k, (iq, _) in enumerate(sectors):
        zdb64, zdr64 = oracle.process_sector(iq, cfg)
        zdb, zdr = results[k]
        assert oracle.relative_l2(zdb64, zdb) < 1e-4
        assert oracle.relative_l2(zdr64, zdr) < 1e-4

    for s in (zdb_sock, zdr_sock):
        s.close()
    ingest.close()
    producer.close()
    egress.close()


def test_zmq_loopback_pipeline(cfg):
    """v2 wire: ZmqProducer -> ZmqIngest -> executor -> ZmqEgress ->
    ZmqResultConsumer, topics A/B/C, per rpv2.cu framing."""
    zmq = pytest.importorskip("zmq")
    from wrp_tpu.io.zmq_io import (ZmqEgress, ZmqIngest, ZmqProducer,
                                   ZmqResultConsumer)

    n_sectors = 4
    sectors = _wire_sectors(cfg, n_sectors, seed=6)

    # pick free tcp ports
    ingest_port, result_port = _free_port(), _free_port()
    producer = ZmqProducer(cfg, endpoint=f"tcp://127.0.0.1:{ingest_port}")
    ingest = ZmqIngest(cfg, endpoint=f"tcp://127.0.0.1:{ingest_port}",
                       timeout_ms=3000)
    egress = ZmqEgress(cfg, endpoint=f"tcp://127.0.0.1:{result_port}")
    consumer = ZmqResultConsumer(cfg, endpoint=f"tcp://127.0.0.1:{result_port}",
                                 timeout_ms=5000)
    import time

    time.sleep(0.3)  # PUB/SUB join

    class _ZmqAdapter:
        """Caps the sector count so the executor finishes the test."""

        def __init__(self, inner, limit):
            self.inner, self.left = inner, limit

        def recv_sector(self):
            if self.left == 0:
                raise TimeoutError("done")
            w, hdr = self.inner.recv_sector()
            if w is not None:
                self.left -= 1
            return w, hdr

    ex = StreamingExecutor(cfg, transport=_ZmqAdapter(ingest, n_sectors),
                           publish=egress, batch=2, max_sectors=n_sectors)
    runner = threading.Thread(target=ex.run, daemon=True)
    runner.start()
    time.sleep(0.2)

    for iq, wire in sectors:
        producer.send_sector(wire)

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

    for c in (producer, ingest, egress, consumer):
        c.close()


def test_full_udp_streaming_pipeline_pallas(cfg):
    """Streaming with the fused-kernel fast path: int16 radix-order decode
    feeds the pallas processor directly (no on-device permutation)."""
    n_sectors = 4
    sectors = _wire_sectors(cfg, n_sectors, seed=9)
    ingest = UdpIngest(cfg, port=0, timeout_s=2.0)
    got = {}

    ex = StreamingExecutor(
        cfg, transport=ingest, method="pallas", batch=2,
        max_sectors=n_sectors,
        publish=lambda sector, elevation, zdb, zdr: got.__setitem__(
            sector, (zdb.copy(), zdr.copy())),
    )
    runner = threading.Thread(target=ex.run, daemon=True)
    runner.start()
    producer = UdpProducer(cfg, port=ingest.local_port)
    for iq, wire in sectors:
        producer.send_sector(wire)
    runner.join(timeout=30)
    assert len(got) == n_sectors

    for k, (iq, _) in enumerate(sectors):
        zdb64, _ = oracle.process_sector(iq, cfg)
        assert oracle.relative_l2(zdb64, got[k][0]) < 1e-4
    ingest.close()
    producer.close()


@pytest.mark.parametrize("wire_order", ["radix", "natural"])
def test_full_udp_streaming_pipeline_device_decode(cfg, wire_order):
    """device_decode: ingest threads ship RAW wire bytes and the
    byteswap/deinterleave (+ radix-reorder with wire_order='natural';
    with the default 'radix' the ingest thread pre-permutes the rows —
    io/codec.reorder_wire_rows — and the device skips its take) runs
    on-chip inside the processor's jit (ops/device_codec) — products
    must still match the fp64 oracle exactly like the host-decoded
    pallas path."""
    n_sectors = 4
    sectors = _wire_sectors(cfg, n_sectors, seed=13)
    ingest = UdpIngest(cfg, port=0, timeout_s=2.0)
    got = {}

    ex = StreamingExecutor(
        cfg, transport=ingest, method="pallas", batch=2,
        max_sectors=n_sectors, device_decode=True, wire_order=wire_order,
        publish=lambda sector, elevation, zdb, zdr: got.__setitem__(
            sector, (zdb.copy(), zdr.copy())),
    )
    runner = threading.Thread(target=ex.run, daemon=True)
    runner.start()
    producer = UdpProducer(cfg, port=ingest.local_port)
    for iq, wire in sectors:
        producer.send_sector(wire)
    runner.join(timeout=30)
    assert len(got) == n_sectors

    for k, (iq, _) in enumerate(sectors):
        zdb64, zdr64 = oracle.process_sector(iq, cfg)
        assert oracle.relative_l2(zdb64, got[k][0]) < 1e-4
        assert oracle.relative_l2(zdr64, got[k][1]) < 1e-4
    ingest.close()
    producer.close()


def test_device_decode_validation():
    """device_decode requires the pallas method (the i16 radix consumer);
    anything else must refuse loudly."""
    import pytest as _pytest

    cfg = tiny_config(m=32, n=16)
    with _pytest.raises(ValueError, match="device_decode"):
        StreamingExecutor(cfg, transport=None, method="mxu",
                          device_decode=True)


def test_udp_extended_results_reconstruct_multi_elevation_volume(cfg):
    """VERDICT r2 item 4: with extended ingest headers AND extended (v1x)
    result frames, a UDP consumer reconstructs the multi-elevation volume
    the reference could only hold in device memory (rpv2.cu:292) — the v1
    result frame drops the elevation (read_single.cc:510-520)."""
    from wrp_tpu.runtime import VolumeScan

    per_cut = 3
    cuts = 2   # the tiny geometry has 2 elevation cuts
    sectors = _wire_sectors(cfg, per_cut * cuts, seed=11)
    ingest = UdpIngest(cfg, port=0, timeout_s=2.0)
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5.0)
    rx_zdr = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_zdr.bind(("127.0.0.1", 0))
    rx_zdr.settimeout(5.0)
    egress = UdpEgress(cfg, zdb_port=rx.getsockname()[1],
                       zdr_port=rx_zdr.getsockname()[1], extended=True)
    ex = StreamingExecutor(cfg, transport=ingest, publish=egress,
                           batch=2, max_sectors=len(sectors))
    runner = threading.Thread(target=ex.run, daemon=True)
    runner.start()
    producer = UdpProducer(cfg, port=ingest.local_port,
                           extended_headers=True)
    labels = [(k % per_cut, k // per_cut) for k in range(len(sectors))]
    for (sec, elev), (_, wire) in zip(labels, sectors):
        producer.send_sector(wire, sector=sec, elevation=elev)

    vs = VolumeScan(cfg, None)
    seen = {}
    for _ in range(len(sectors)):
        for prod, sock_ in ((0, rx), (1, rx_zdr)):
            buf, _ = sock_.recvfrom(65536)
            sector, elev, values = frames.unpack_result_udp(buf)
            assert elev is not None    # every frame must be v1x
            vs.data[prod, :, sector, elev] = values
            seen.setdefault((sector, elev), set()).add(prod)
    runner.join(timeout=30)
    assert set(seen) == set(labels)    # both cuts placed, not only cut 0
    assert all(v == {0, 1} for v in seen.values())
    # zero cross-contamination: each (sector, elevation) cell holds the
    # products of the sector that was sent with that label
    for (sec, elev), (iq, _) in zip(labels, sectors):
        zdb64, _ = oracle.process_sector(iq, cfg)
        assert oracle.relative_l2(zdb64, vs.data[0, :, sec, elev]) < 1e-4
    ingest.close()
    producer.close()
    egress.close()
    rx.close()
    rx_zdr.close()


@pytest.mark.parametrize("method", ["mxu", "pallas"])
def test_multifeed_consolidation_zero_cross_contamination(cfg, method):
    """VERDICT r2 item 8 / DESIGN.md section 6 consolidation story: one
    processor multiplexes N radar feeds — per-feed ingest threads,
    per-feed volumes, per-feed stats, one compiled chain.  Both feeds
    send DIFFERENT data under the SAME sector labels; each per-feed
    volume must match its own feed's oracle products exactly where
    coverage says so (zero cross-contamination of sector labels)."""
    from wrp_tpu.runtime import VolumeScan

    n_per_feed = 3
    feeds = 2
    data = [_wire_sectors(cfg, n_per_feed, seed=20 + f)
            for f in range(feeds)]
    ingests = [UdpIngest(cfg, port=0, timeout_s=2.0) for _ in range(feeds)]
    vols = [VolumeScan(cfg, None) for _ in range(feeds)]
    ex = StreamingExecutor(cfg, transport=ingests, volume=vols,
                           batch=2, max_sectors=n_per_feed, method=method)
    res = []
    runner = threading.Thread(target=lambda: res.append(ex.run()),
                              daemon=True)
    runner.start()
    producers = [UdpProducer(cfg, port=ing.local_port,
                             extended_headers=True) for ing in ingests]
    for k in range(n_per_feed):
        for f in range(feeds):
            producers[f].send_sector(data[f][k][1], sector=k, elevation=0)
    runner.join(timeout=60)
    assert res, "executor did not finish"
    stats = res[0]
    assert stats["processed_sectors"] == feeds * n_per_feed
    assert [fs["processed_sectors"] for fs in stats["feeds"]] == [
        n_per_feed, n_per_feed]
    assert all(fs["transport"]["sectors"] == n_per_feed
               for fs in stats["feeds"])
    for f in range(feeds):
        for k in range(n_per_feed):
            assert vols[f].coverage[k, 0]
            zdb64, zdr64 = oracle.process_sector(data[f][k][0], cfg)
            assert oracle.relative_l2(zdb64, vols[f].data[0, :, k, 0]) < 1e-4
            assert oracle.relative_l2(zdr64, vols[f].data[1, :, k, 0]) < 1e-4
    # the two feeds' fields are genuinely different: matching the wrong
    # feed's volume would fail loudly
    assert oracle.relative_l2(vols[0].data[0, 1:, 0, 0],
                              vols[1].data[0, 1:, 0, 0]) > 1e-3
    for x in ingests + producers:
        x.close()


def test_multifeed_zmq_consolidation(cfg):
    """The consolidation story over the v2 wire: one SUB socket per
    feed endpoint, per-feed volumes, zero cross-contamination.  ZMQ
    bodies carry no sector header, so labels are positional per feed —
    each feed's own counter must advance independently."""
    import time

    pytest.importorskip("zmq")
    from wrp_tpu.io.zmq_io import ZmqIngest, ZmqProducer
    from wrp_tpu.runtime import VolumeScan

    n_per_feed = 3
    feeds = 2
    data = [_wire_sectors(cfg, n_per_feed, seed=30 + f)
            for f in range(feeds)]
    ports = [_free_port() for _ in range(feeds)]
    producers = [ZmqProducer(cfg, endpoint=f"tcp://127.0.0.1:{p}")
                 for p in ports]
    ingests = [ZmqIngest(cfg, endpoint=f"tcp://127.0.0.1:{p}",
                         timeout_ms=2000) for p in ports]
    time.sleep(0.3)  # PUB/SUB join
    vols = [VolumeScan(cfg, None) for _ in range(feeds)]
    ex = StreamingExecutor(cfg, transport=ingests, volume=vols,
                           batch=2, max_sectors=n_per_feed, method="mxu")
    res = []
    runner = threading.Thread(target=lambda: res.append(ex.run()),
                              daemon=True)
    runner.start()
    time.sleep(0.2)
    for k in range(n_per_feed):
        for f in range(feeds):
            producers[f].send_sector(data[f][k][1])
    runner.join(timeout=60)
    assert res, "executor did not finish"
    stats = res[0]
    assert stats["processed_sectors"] == feeds * n_per_feed
    assert [fs["processed_sectors"] for fs in stats["feeds"]] == [
        n_per_feed, n_per_feed]
    for f in range(feeds):
        for k in range(n_per_feed):
            assert vols[f].coverage[k, 0]
            zdb64, zdr64 = oracle.process_sector(data[f][k][0], cfg)
            assert oracle.relative_l2(zdb64, vols[f].data[0, :, k, 0]) < 1e-4
            assert oracle.relative_l2(zdr64, vols[f].data[1, :, k, 0]) < 1e-4
    # the feeds carry genuinely different fields: a label mixup between
    # the SUB sockets would fail the oracle pins above loudly
    assert oracle.relative_l2(vols[0].data[0, 1:, 0, 0],
                              vols[1].data[0, 1:, 0, 0]) > 1e-3
    for x in ingests + producers:
        x.close()


def test_zmq_extended_headers_place_sectors_by_label(cfg):
    """Opt-in zmq extended framing ([topic, header, body]): the
    reference's 2-part v2 wire has only positional labels (rpv2.cu
    sector counter), which mislabels everything after a checkpoint+
    relaunch; with headers the executor places sectors by the carried
    (sector, elevation) exactly like the udp `produce --headers` path."""
    import time

    pytest.importorskip("zmq")
    from wrp_tpu.io.zmq_io import ZmqIngest, ZmqProducer
    from wrp_tpu.runtime import VolumeScan

    port = _free_port()
    producer = ZmqProducer(cfg, endpoint=f"tcp://127.0.0.1:{port}",
                           extended_headers=True)
    ingest = ZmqIngest(cfg, endpoint=f"tcp://127.0.0.1:{port}",
                       timeout_ms=2000)
    time.sleep(0.3)  # PUB/SUB join
    labels = [(5, 1), (2, 0)]     # non-positional on purpose
    sectors = _wire_sectors(cfg, len(labels), seed=40)
    vs = VolumeScan(cfg, None)
    ex = StreamingExecutor(cfg, transport=ingest, volume=vs,
                           batch=2, max_sectors=len(labels), method="mxu")
    res = []
    runner = threading.Thread(target=lambda: res.append(ex.run()),
                              daemon=True)
    runner.start()
    time.sleep(0.2)
    for (sec, elev), (_, wire) in zip(labels, sectors):
        producer.send_sector(wire, sector=sec, elevation=elev)
    runner.join(timeout=60)
    assert res, "executor did not finish"
    for (sec, elev), (iq, _) in zip(labels, sectors):
        assert vs.coverage[sec, elev]
        zdb64, _ = oracle.process_sector(iq, cfg)
        assert oracle.relative_l2(zdb64, vs.data[0, :, sec, elev]) < 1e-4
    producer.close()
    ingest.close()


def test_zmq_producer_process_exit_flushes_tail(cfg, tmp_path):
    """Regression: `cli produce --transport zmq` used to exit right
    after the last send, dropping the queued message (PUB sends go to
    an io thread; a whole sector is MBs) — close() must block until
    delivered or the bounded linger expires.  Caught live: a 3-sector
    produce delivered NOTHING to a connected SUB."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    pytest.importorskip("zmq")
    import zmq as _zmq

    repo = Path(__file__).resolve().parent.parent
    port = _free_port()
    ctx = _zmq.Context.instance()
    sub = ctx.socket(_zmq.SUB)
    sub.connect(f"tcp://127.0.0.1:{port}")
    sub.setsockopt(_zmq.SUBSCRIBE, b"A")
    sub.setsockopt(_zmq.RCVTIMEO, 30000)
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": str(repo),
           "PATH": "/usr/bin:/bin", "HOME": "/root"}
    subprocess.run(
        [_sys.executable, "-m", "wrp_tpu.cli", "produce",
         "--transport", "zmq", "--zmq-bind", f"tcp://127.0.0.1:{port}",
         "--sectors", "1", "--headers"],     # NO --rate: no sleep after send
        cwd=repo, check=True, capture_output=True, timeout=120, env=env)
    try:
        parts = sub.recv_multipart()
    except _zmq.Again:
        raise AssertionError("producer exited without flushing its tail")
    from wrp_tpu.config import DEFAULT_CONFIG

    assert len(parts) == 3                    # topic, header, body
    assert len(parts[-1]) == DEFAULT_CONFIG.sector_nbytes_wire
    sub.close(0)


def test_feed_endpoint_flag_validation(capsys):
    """--feed-endpoint is zmq-only, --feed-port is udp/tcp-only, and
    duplicate endpoints are refused (two SUBs on one endpoint would
    each receive every message)."""
    from wrp_tpu import cli

    rc = cli.main(["stream", "--transport", "udp",
                   "--feed-endpoint", "tcp://127.0.0.1:5563"])
    assert rc == 2
    assert "zmq transport only" in capsys.readouterr().err
    rc = cli.main(["stream", "--transport", "zmq",
                   "--feed-endpoint", "tcp://127.0.0.1:5563",
                   "--feed-endpoint", "tcp://127.0.0.1:5563"])
    assert rc == 2
    assert "duplicate --feed-endpoint" in capsys.readouterr().err
    rc = cli.main(["stream", "--transport", "zmq",
                   "--feed-port", "9000"])
    assert rc == 2
    assert "--feed-endpoint" in capsys.readouterr().err


def test_sigterm_graceful_shutdown(tmp_path):
    """SIGTERM (service-manager stop) must take the same graceful path
    as Ctrl-C: finish in-flight work, save the volume checkpoint, print
    the stats summary, exit 0."""
    import json
    import signal
    import subprocess
    import sys
    import time
    from pathlib import Path

    REPO = Path(__file__).resolve().parent.parent
    ready = tmp_path / "ready"
    ckpt = tmp_path / "vol.npz"
    from conftest import cpu_subprocess_env

    env = cpu_subprocess_env()
    proc = subprocess.Popen(
        [sys.executable, "-m", "wrp_tpu.cli", "stream", "--transport",
         "udp", "--ingest-port", "0", "--timeout", "0.5",
         "--ready-file", str(ready), "--checkpoint", str(ckpt)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env)
    deadline = time.monotonic() + 120
    while not ready.exists():
        assert proc.poll() is None, proc.communicate()
        assert time.monotonic() < deadline, "never became ready"
        time.sleep(0.3)
    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=60)
    assert proc.returncode == 0, (out[-500:], err[-2000:])
    stats = json.loads(out)
    assert "processed_sectors" in stats
    assert ckpt.exists()          # checkpoint saved on the way out


@pytest.mark.parametrize("native", [False, True])
def test_udp_reassembly_fuzz(cfg, native):
    """Randomized datagram streams against the reassembly state machine:
    interleaved valid rows, duplicates, corrupt headers, runt payloads,
    out-of-order rows, and sector-boundary jumps.  Invariants: the only
    exception is TimeoutError, completed sectors return exactly
    sector_nbytes_wire bytes, and the stats counters stay consistent."""
    ingest = UdpIngest(cfg, port=0, timeout_s=0.15, native=native)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    addr = ("127.0.0.1", ingest.local_port)
    rng = np.random.default_rng(7 + native)
    rb = cfg.datagram_nbytes
    m = cfg.num_range_cells
    (_, wire), = _wire_sectors(cfg, 1)

    completed = 0
    for _ in range(30):
        kind = rng.integers(0, 5)
        if kind == 0:        # a full valid sector, rows in order
            sec = int(rng.integers(0, cfg.num_sectors))
            for row in range(m):
                sock.sendto(frames.pack_ingest_row(
                    frames.IngestHeader(sec, 0, row),
                    wire[row * rb:(row + 1) * rb]), addr)
        elif kind == 1:      # duplicates of a few rows
            for row in [0, 0, 1, 1]:
                sock.sendto(frames.pack_ingest_row(
                    frames.IngestHeader(1, 0, row),
                    wire[row * rb:(row + 1) * rb]), addr)
        elif kind == 2:      # corrupt header garbage
            sock.sendto(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(),
                        addr)
        elif kind == 3:      # runt payload with a valid-looking header
            sock.sendto(frames.pack_ingest_row(
                frames.IngestHeader(2, 1, 3), b"xy"), addr)
        else:                # out-of-range row index
            sock.sendto(frames.pack_ingest_row(
                frames.IngestHeader(3, 2, m + 7), wire[:rb]), addr)
        try:
            got = ingest.recv_sector()
        except TimeoutError:
            continue
        buf, header = got if isinstance(got, tuple) else (got, None)
        if buf is not None:
            assert len(bytes(buf)) == cfg.sector_nbytes_wire
            completed += 1
    st = ingest.stats
    # exact accounting: every returned buffer was counted exactly once,
    # and completing a sector takes at least m unique-row datagrams
    assert st.sectors == completed
    assert st.datagrams >= completed * m
    assert completed >= 1  # kind-0 full sectors must actually complete
    ingest.close()
    sock.close()


def test_stream_channels2_end_to_end(tmp_path):
    """--channels 2 (the reference's best-published production profile,
    hh+vv only, read.cc:61-62) as a FLAG through produce -> stream ->
    volume: the 2-channel wire (8 B/sample) decodes, processes, and the
    stored products pin to the 2-channel fp64 oracle."""
    import dataclasses
    import json
    import subprocess
    import sys
    import time
    from pathlib import Path

    from conftest import cpu_subprocess_env
    from wrp_tpu import oracle
    from wrp_tpu.config import DEFAULT_CONFIG
    from wrp_tpu.oracle import produce_sector_iq
    from wrp_tpu.runtime import VolumeScan

    REPO = Path(__file__).resolve().parent.parent
    cfg2 = dataclasses.replace(DEFAULT_CONFIG, num_channels=2).validate()
    ready = tmp_path / "ready"
    ckpt = tmp_path / "vol2.npz"
    env = cpu_subprocess_env()
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "wrp_tpu.cli", "stream", "--transport",
         "udp", "--channels", "2", "--ingest-port", str(port),
         "--timeout", "1", "--max-sectors", "2", "--batch", "2",
         "--idle-limit", "30",
         "--ready-file", str(ready), "--checkpoint", str(ckpt)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env)
    deadline = time.monotonic() + 120
    while not ready.exists():
        assert proc.poll() is None, proc.communicate()
        assert time.monotonic() < deadline, "never became ready"
        time.sleep(0.3)
    subprocess.run(
        [sys.executable, "-m", "wrp_tpu.cli", "produce", "--transport",
         "udp", "--channels", "2", "--ingest-port", str(port),
         "--sectors", "2", "--headers", "--per-sector-seed",
         "--seed", "77"],
        cwd=REPO, check=True, capture_output=True, timeout=120, env=env)
    out, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, (out[-500:], err[-2000:])
    stats = json.loads(out[out.index("{"):])
    assert stats["processed_sectors"] == 2, stats
    vol = VolumeScan.load(str(ckpt))
    for k in range(2):
        iq2 = produce_sector_iq(cfg2, 77, k)
        assert iq2.shape[0] == 2
        zdb64, _ = oracle.process_sector(iq2, cfg2)
        err_k = oracle.relative_l2(zdb64, vol.data[0, :, k, 0])
        assert err_k < 1e-4, (k, err_k)
