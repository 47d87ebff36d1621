"""Runtime components: volume checkpointing, metrics, executor batching."""

import numpy as np
import pytest

from wrp_tpu.config import tiny_config
from wrp_tpu.runtime import VolumeScan, StageTimers, Throughput
from wrp_tpu.runtime.executor import StreamingExecutor, SectorTask


def test_volume_store_and_coverage(tmp_path):
    cfg = tiny_config(m=16, n=8)
    vs = VolumeScan(cfg, tmp_path / "vol.npz")
    assert vs.fraction() == 0.0
    zdb = np.arange(cfg.num_output_bins, dtype=np.float32)
    vs.store(3, 1, zdb, -zdb)
    assert vs.coverage[3, 1] and not vs.complete()
    np.testing.assert_array_equal(vs.data[0, :, 3, 1], zdb)
    np.testing.assert_array_equal(vs.data[1, :, 3, 1], -zdb)


def test_volume_checkpoint_resume(tmp_path):
    cfg = tiny_config(m=16, n=8)
    vs = VolumeScan(cfg, tmp_path / "vol.npz")
    for s in range(cfg.num_sectors):
        vs.store(s, 0, np.full(cfg.num_output_bins, float(s), np.float32),
                 np.zeros(cfg.num_output_bins, np.float32))
    p = vs.save()
    resumed = VolumeScan.load(p, cfg)
    assert resumed.fraction() == vs.fraction()
    np.testing.assert_array_equal(resumed.data, vs.data)
    # geometry mismatch rejected
    with pytest.raises(ValueError):
        VolumeScan.load(p, tiny_config(m=32, n=8))


def test_stage_timers():
    t = StageTimers()
    with t.time("a"):
        pass
    with t.time("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0


def test_throughput_counter():
    tp = Throughput()
    tp.tick(5)
    tp.tick(3)
    assert tp.count == 8
    assert tp.rate() > 0


class _FakeTransport:
    """Feeds N wire sectors then EOF, mimicking UdpIngest's tuple API."""

    def __init__(self, cfg, n):
        from wrp_tpu.io import codec

        self.cfg = cfg
        rng = np.random.default_rng(0)
        self.wires = [
            codec.encode_iq(
                rng.integers(-2048, 2048, cfg.sector_shape)
                + 1j * rng.integers(-2048, 2048, cfg.sector_shape), cfg)
            for _ in range(n)
        ]
        self.i = 0

    def recv_sector(self):
        if self.i >= len(self.wires):
            raise TimeoutError("eof")
        w = self.wires[self.i]
        self.i += 1
        return w, None


def test_executor_end_to_end():
    cfg = tiny_config(m=32, n=16)
    n = 10
    transport = _FakeTransport(cfg, n)
    published = []
    vs = VolumeScan(cfg)
    ex = StreamingExecutor(
        cfg, transport=transport,
        publish=lambda s, e, zdb, zdr: published.append((s, e)),
        batch=4, max_sectors=n, volume=vs, debug_sync=True,
    )
    stats = ex.run()
    assert stats["processed_sectors"] == n
    assert len(published) == n
    # sector/elevation counters advanced like rpv2 (wrap at num_sectors)
    assert published[0] == (0, 0)
    assert published[cfg.num_sectors] == (0, 1)  # elevation bump on wrap
    assert vs.coverage.sum() == n
    # per-stage timers recorded
    assert "ingest/decode" in stats["timers"]
    assert "compute/dispatch" in stats["timers"]


def test_executor_results_match_direct_pipeline():
    from wrp_tpu.io import codec
    from wrp_tpu.pipeline import SectorProcessor

    cfg = tiny_config(m=32, n=16)
    transport = _FakeTransport(cfg, 3)
    wires = list(transport.wires)
    got = {}
    ex = StreamingExecutor(
        cfg, transport=transport,
        publish=lambda s, e, zdb, zdr: got.__setitem__(s, (zdb, zdr)),
        batch=2, max_sectors=3,
    )
    ex.run()
    proc = SectorProcessor(cfg, method="mxu")
    for k, wire in enumerate(wires):
        planar = codec.decode_iq(wire, cfg)
        zdb, zdr = proc(planar[None])
        np.testing.assert_array_equal(got[k][0], np.asarray(zdb)[0])
        np.testing.assert_array_equal(got[k][1], np.asarray(zdr)[0])
