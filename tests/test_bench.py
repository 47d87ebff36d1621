"""The benchmark harness itself is part of the proof surface: its JSON
contract (driver-facing), its parity self-check, and the sharded
(shard_map) measurement path must not rot.  Smoke runs on CPU."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(*flags):
    from conftest import cpu_subprocess_env

    env = cpu_subprocess_env(
        XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "bench.py", "--smoke", *flags],
        cwd=REPO, capture_output=True, text=True, timeout=300, env=env)
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_bench_smoke_json_contract():
    r = _run_bench()
    assert r["metric"] == "sectors_per_second_3ch"
    assert r["value"] > 0 and r["unit"] == "sectors/s"
    assert r["vs_baseline"] > 0
    # the parity self-check gates every run (exit 1 + JSON error on
    # failure); its measurements ride in the result
    e0, e1 = r["parity_rel_l2"]
    assert e0 < 1e-4 and e1 < 1e-3
    # the pipelined with-H2D metric (the production streaming form,
    # VERDICT r3 item 8) must ride in every result
    assert r["sectors_per_second_with_h2d_pipelined"] > 0
    # session calibration fields exist (null on CPU smoke: the probe
    # is a TPU yardstick, VERDICT r3 item 2)
    assert "calib_tflops" in r and "value_normalized" in r
    assert r["calib_tflops"] is None and r["value_normalized"] is None


def test_bench_smoke_sharded_runs_under_mesh():
    """--sharded wraps the salted loop in shard_map (the compiled-on-
    metal configuration, SHARDED_TPU_r03.json); keep the CPU lowering
    and both production sharded entries' parity checks alive."""
    r = _run_bench("--sharded", "2")
    assert r["sharded_devices"] == 2
    par = r["sharded_parity_rel_l2"]
    assert par["pallas"] < 1e-4      # vs unsharded flagship
    assert par["mxu"] < 1e-3         # transpose path, degenerate seq=1
    assert r["value"] > 0


def test_bench_smoke_salted_xla_method():
    """The ladder methods run under the per-repeat-salted loop; the
    self-check pins the cancellation residual."""
    r = _run_bench("--method", "parseval")
    assert r["method"] == "parseval"
    assert r["parity_rel_l2"][1] < 1e-3


def test_bench_smoke_wire_staging_decodes_on_chip():
    """--in-dtype wire stages RAW reference wire bytes and decodes them
    inside the timed span; the default wire-decode mode is the FUSED
    kernel (decode inside fused_chain_power_wire — no deinterleave) and
    the parity gate proves it reproduces the host-decoded processor."""
    r = _run_bench("--in-dtype", "wire")
    assert r["in_dtype"] == "wire"
    assert r["wire_decode"] == "fused"
    e0, e1 = r["parity_rel_l2"]
    assert e0 < 1e-4 and e1 < 1e-3
    assert r["value"] > 0


def test_bench_smoke_wire_xla_decode_mode():
    """--wire-decode xla keeps the r4 standalone-decode formulation
    (decode_wire_i16 + planar kernel) measurable as the A/B reference."""
    r = _run_bench("--in-dtype", "wire", "--wire-decode", "xla")
    assert r["wire_decode"] == "xla"
    e0, e1 = r["parity_rel_l2"]
    assert e0 < 1e-4 and e1 < 1e-3
    assert r["value"] > 0


def test_wire_ab_smoke_contract():
    """tools/wire_ab.py (the wire-fused cost decomposition behind the
    round-5 wire rework) must keep its parity pins (fused-vs-i16 kernel,
    strided-vs-take bit-identity) and JSON contract alive."""
    from conftest import cpu_subprocess_env

    out = subprocess.run(
        [sys.executable, "tools/wire_ab.py", "--smoke"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env=cpu_subprocess_env())
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-2000:])
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert r["parity_wire_vs_i16_rel_l2"] < 1e-5
    for v in ("k_i16", "k_wire", "k_wire_strided", "take+slice+k_wire",
              "slice+k_wire"):
        assert "error" not in r[v], (v, r[v])
        assert r[v]["us_per_sector"] > 0, (v, r[v])


def test_ab_sweep_smoke_contract():
    """tools/ab_sweep.py (the one-staging variant sweep) must keep its
    per-variant JSON contract and parity gates alive; a 3-variant subset
    covering the flat, pre-paired, and pre-quadded stagings keeps this
    fast."""
    from conftest import cpu_subprocess_env

    out = subprocess.run(
        [sys.executable, "tools/ab_sweep.py", "--smoke",
         "--variants", "kcat,pair_pre_int,quad_pre_int"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env=cpu_subprocess_env())
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-2000:])
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert len(lines) == 4   # 3 variants + summary
    for row in lines[:3]:
        assert row["parity_ok"], row
        e0, e1 = row["parity_rel_l2"]
        assert e0 < 1e-4 and e1 < 1e-3
        assert row["sectors_per_second"] > 0
    assert lines[0]["variant"] == "kcat" and lines[0]["xpair"] is None
    assert lines[1]["variant"] == "pair_pre_int"
    assert lines[1]["xsplit"] == "int" and lines[1]["xpair"] == "pre"
    assert lines[2]["variant"] == "quad_pre_int"
    assert lines[2]["xsplit"] == "int" and lines[2]["xpair"] == "pre4"
    assert lines[3]["best"] in ("kcat", "pair_pre_int", "quad_pre_int")


def test_decode_ab_smoke_contract():
    """tools/decode_ab.py (the on-chip wire-decode A/B behind
    DECODE_AB_r04.json) must keep all seven variants parity-pinned to
    the host decoder and its JSON contract alive — it was the one
    measurement tool without a contract test (VERDICT r3 item 1)."""
    from conftest import cpu_subprocess_env

    out = subprocess.run(
        [sys.executable, "tools/decode_ab.py", "--smoke"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env=cpu_subprocess_env())
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-2000:])
    r = json.loads(out.stdout.strip().splitlines()[-1])
    names = ["v0_current", "v1_take_rows", "v2_slices", "v3_flat",
             "v4_i32", "v5_byteslice", "v6_bitcast_slice"]
    for v in names:
        # parity failures and compile errors land as {"error": ...};
        # a healthy variant reports its timing fields
        assert "error" not in r[v], (v, r[v])
        assert r[v]["us_per_sector"] > 0, (v, r[v])


def test_consolidation_soak_smoke_contract():
    """tools/consolidation_soak.py (the N-feeds-one-chip scaling
    evidence behind CONSOLIDATION_r04.json) must keep its per-feed JSON
    contract alive: a udp+zmq feed pair, per-feed latency percentiles,
    loss accounting, and the per-feed fp64-oracle contamination check
    (with its wrong-feed teeth probe)."""
    from conftest import cpu_subprocess_env

    out = subprocess.run(
        [sys.executable, "tools/consolidation_soak.py", "--smoke",
         # dedicated port range: the tool's default base collides with
         # any concurrently-running real soak on the same box
         "--base-port", "23150"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env=cpu_subprocess_env())
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-2000:])
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    record = lines[-1]
    assert record["metric"] == "consolidation_soak"
    assert record["kinds"] == ["udp", "zmq"]
    assert record["contamination_failures"] == []
    assert len(record["per_feed"]) == 2
    for row in record["per_feed"]:
        assert row["processed_sectors"] > 0
        assert row["verify_rel_l2_max"] < 1e-6     # CPU fp32 floor
        assert row["p99_ms"] is not None


def test_int_split_repro_smoke_contract():
    """tools/int_split_repro.py (the filing-ready reduction of the
    Mosaic int-mask SIGABRT, VERDICT r3 item 5b) must keep both its
    variants runnable in interpret mode and its JSON contract alive —
    on the TPU the int variant documents the toolchain failure, so the
    harness around it must not rot."""
    from conftest import cpu_subprocess_env

    for variant in ("int", "f32"):
        out = subprocess.run(
            [sys.executable, "tools/int_split_repro.py", "--smoke",
             "--variant", variant],
            cwd=REPO, capture_output=True, text=True, timeout=300,
            env=cpu_subprocess_env())
        assert out.returncode == 0, (variant, out.stdout[-300:],
                                     out.stderr[-2000:])
        r = json.loads(out.stdout.strip().splitlines()[-1])
        assert r["variant"] == variant and r["ok"] and not r["repro"]
