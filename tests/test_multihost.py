"""Real multi-process mesh test: 2 processes x 4 virtual CPU devices form
one 8-device global mesh (gloo collectives), each process feeds its own
host-local sector batch and collects its own products — the multi-host
topology of parallel/multihost.py without a pod (SURVEY.md section 4:
'multi-node testing without a cluster')."""

import socket

import numpy as np
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from wrp_tpu.config import tiny_config
from wrp_tpu import oracle, pipeline
from wrp_tpu.parallel.multihost import MultiHostProcessor, init_distributed

init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
assert jax.device_count() == 4 * nproc, jax.device_count()

cfg = tiny_config(m=64, n=32)
B = 4  # per-host batch
rng = np.random.default_rng(100 + pid)   # DIFFERENT data per host
iq = (rng.integers(-2048, 2048, (B, *cfg.sector_shape))
      + 1j * rng.integers(-2048, 2048, (B, *cfg.sector_shape)))
planar = pipeline.to_planar(iq.astype(np.complex64))

proc = MultiHostProcessor.build(cfg, per_host_batch=B, method="mxu")
zdb, zdr = proc.step_local(planar)
assert zdb.shape == (B, cfg.num_output_bins), zdb.shape

for k in range(B):
    zdb64, zdr64 = oracle.process_sector(iq[k], cfg)
    e = oracle.relative_l2(zdb64, zdb[k])
    assert e < 1e-4, (pid, k, e)
print(f"MULTIHOST_OK pid={pid}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_mesh():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), "2", str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0 and "MULTIHOST_OK" in out, (rc, out, err[-2000:])


PULSE_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from wrp_tpu.config import tiny_config
from wrp_tpu import oracle, pipeline
from wrp_tpu.parallel.multihost import PulseShardedProcessor, init_distributed

init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

cfg = tiny_config(m=64, n=32)
B = 4
rng = np.random.default_rng(7)       # SAME data on every host: one wire
iq = (rng.integers(-2048, 2048, (B, *cfg.sector_shape))
      + 1j * rng.integers(-2048, 2048, (B, *cfg.sector_shape)))
planar = pipeline.to_planar(iq.astype(np.complex64))

proc = PulseShardedProcessor.build(cfg, batch=B, method="mxu")
# seq axis must span the two PROCESSES (column p = process p's devices)
assert proc.mesh.shape == {"data": 2, "seq": 2}, proc.mesh.shape
col = proc.mesh.devices[:, pid]
assert all(d.process_index == pid for d in col), proc.mesh.devices
zdb, zdr = proc.step_local(planar)
assert zdb.shape == (B, cfg.num_output_bins), zdb.shape

for k in range(B):
    zdb64, zdr64 = oracle.process_sector(iq[k], cfg)
    e = oracle.relative_l2(zdb64, zdb[k])
    assert e < 1e-4, (pid, k, e)

# the flagship kernel on the same cross-host mesh: method="pallas" runs
# the seq-sharded fused formulation (A-stage kernel per pulse slice,
# cross-host all_to_all, Parseval-epilogue kernel) — VERDICT r4 item 2
proc_p = PulseShardedProcessor.build(cfg, batch=B, method="pallas")
zdb_p, zdr_p = proc_p.step_local(planar)
e = oracle.relative_l2(zdb, zdb_p)
assert e < 1e-5, (pid, "pallas vs mxu", e)

# and its device-decode variant: raw wire bytes in, each host slices its
# pulse-byte columns, the decode runs on-chip inside the sharded step
from wrp_tpu.io import codec
wires = np.stack([
    np.frombuffer(codec.encode_iq(iq[k].astype(np.complex64), cfg),
                  np.uint8)
    for k in range(B)])
proc_w = PulseShardedProcessor.build(cfg, batch=B, method="pallas",
                                     device_decode=True)
assert proc_w.wire_input
zdb_w, zdr_w = proc_w.step_local(wires)
e = oracle.relative_l2(zdb_p, zdb_w)
assert e < 1e-6, (pid, "pallas wire vs planar", e)
print(f"PULSESHARD_OK pid={pid}", flush=True)
"""


def test_pulse_sharded_two_hosts_parity():
    """PulseShardedProcessor: 2 processes x 2 devices, the seq axis
    crossing the process boundary (a REAL cross-host all_to_all), full
    products on every host, oracle-exact — for the mxu formulation AND
    the seq-sharded flagship kernel (method="pallas", plain and
    device-decode)."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", PULSE_WORKER, str(pid), "2", str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        assert p.returncode == 0 and "PULSESHARD_OK" in out, (
            pid, p.returncode, out, err[-2000:])


def test_lockstep_dead_peer_bounded_exit(tmp_path):
    """VERDICT r2 item 3: a killed lock-step host must NOT leave the
    survivor blocked in the collective forever.  With
    --collective-timeout the survivor saves its volume checkpoint,
    prints stats to stderr, and exits code 3 within the bound (the
    reference hung silently; round 2 hung loudly; this exits)."""
    import json
    import signal
    import time

    coord_port = _free_port()
    hosts = []
    ports = [(_free_port(), _free_port(), _free_port()) for _ in range(2)]
    ready = [tmp_path / f"ready{pid}" for pid in range(2)]
    ckpt = [tmp_path / f"vol{pid}.npz" for pid in range(2)]
    for pid in range(2):
        ing, zdb, zdr = ports[pid]
        env = {
            "JAX_PLATFORM_NAME": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": str(REPO),
        }
        hosts.append(subprocess.Popen(
            [sys.executable, "-m", "wrp_tpu.cli", "stream",
             "--transport", "udp", "--ingest-port", str(ing),
             "--zdb-port", str(zdb), "--zdr-port", str(zdr),
             "--batch", "2", "--max-sectors", "4", "--timeout", "5",
             "--ready-file", str(ready[pid]),
             "--checkpoint", str(ckpt[pid]),
             "--collective-timeout", "15",
             "--coordinator", f"127.0.0.1:{coord_port}",
             "--num-hosts", "2", "--host-id", str(pid)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))

    deadline = time.monotonic() + 180
    while not all(r.exists() for r in ready):
        for p in hosts:
            assert p.poll() is None, p.communicate()
        assert time.monotonic() < deadline, "hosts never became ready"
        time.sleep(0.5)

    # kill host 1 mid-stream (after mesh join + warmup), then feed host 0
    # a full batch: its collective step now has no peer
    hosts[1].send_signal(signal.SIGKILL)
    hosts[1].wait(timeout=30)
    subprocess.run(
        [sys.executable, "-m", "wrp_tpu.cli", "produce",
         "--transport", "udp", "--ingest-port", str(ports[0][0]),
         "--sectors", "2", "--headers", "--rate", "2"],
        cwd=REPO, check=True, capture_output=True, timeout=120)

    t0 = time.monotonic()
    out, err = hosts[0].communicate(timeout=120)
    waited = time.monotonic() - t0
    assert hosts[0].returncode == 3, (hosts[0].returncode, out[-500:],
                                      err[-3000:])
    assert "collective" in err        # the bounded-exit diagnostic
    assert ckpt[0].exists()           # volume checkpoint saved on abort
    # the stats summary is the LAST stderr line (written by the abort)
    stats = json.loads(err.strip().splitlines()[-1])
    assert "processed_sectors" in stats
    assert waited < 100, waited       # bounded, not a silent hang


def _launch_lockstep_hosts(tmp_path, coord_port, ports, ckpt, tag,
                           max_sectors, extra=()):
    hosts, ready = [], []
    for pid in range(2):
        ing, zdb, zdr = ports[pid]
        r = tmp_path / f"ready-{tag}-{pid}"
        ready.append(r)
        env = {
            "JAX_PLATFORM_NAME": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": str(REPO),
        }
        hosts.append(subprocess.Popen(
            [sys.executable, "-m", "wrp_tpu.cli", "stream",
             "--transport", "udp", "--ingest-port", str(ing),
             "--zdb-port", str(zdb), "--zdr-port", str(zdr),
             "--batch", "2", "--max-sectors", str(max_sectors),
             "--timeout", "5", "--checkpoint-every", "0",
             "--ready-file", str(r), "--checkpoint", str(ckpt[pid]),
             *extra,
             "--coordinator", f"127.0.0.1:{coord_port}",
             "--num-hosts", "2", "--host-id", str(pid)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))
    return hosts, ready


def _await_ready(hosts, ready):
    import time

    deadline = time.monotonic() + 180
    while not all(r.exists() for r in ready):
        for p in hosts:
            assert p.poll() is None, p.communicate()
        assert time.monotonic() < deadline, "hosts never became ready"
        time.sleep(0.5)


def _produce(port, sectors, start=0, rate=2):
    subprocess.run(
        [sys.executable, "-m", "wrp_tpu.cli", "produce",
         "--transport", "udp", "--ingest-port", str(port),
         "--sectors", str(sectors), "--start-sector", str(start),
         "--headers", "--rate", str(rate)],
        cwd=REPO, check=True, capture_output=True, timeout=120)


def test_lockstep_kill_restart_resume_completes(tmp_path):
    """The full failure-recovery cycle, end to end, with the semantics
    the data-parallel design actually gives (parallel/multihost.py): the
    per-step program has NO cross-host collective, so a SIGKILLed peer
    does not even interrupt the survivor — it keeps processing its own
    sectors to completion and, thanks to the bounded lock-step exit in
    cmd_stream, exits 0 promptly instead of hanging ~90 s in the atexit
    jax.distributed.shutdown until the coordination service's fatal
    teardown (rc 1).  Then BOTH hosts restart with --checkpoint and the
    dead host's producer resumes at the next sector label; both volumes
    complete.  (The reference lost everything in this scenario; the
    --collective-timeout bound additionally covers programs whose steps
    DO block on collectives, e.g. seq-sharded meshes.)"""
    import json
    import signal
    import time

    from wrp_tpu.runtime import VolumeScan

    ports = [(_free_port(), _free_port(), _free_port()) for _ in range(2)]
    ckpt = [tmp_path / f"vol{pid}.npz" for pid in range(2)]

    # ---- phase A: both hosts process one full batch, checkpointed ----
    hosts, ready = _launch_lockstep_hosts(
        tmp_path, _free_port(), ports, ckpt, "a", max_sectors=4,
        extra=("--collective-timeout", "15"))
    _await_ready(hosts, ready)
    for pid in range(2):
        _produce(ports[pid][0], 2)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        try:
            if all(c.exists()
                   and VolumeScan.load(str(c)).coverage.sum() == 2
                   for c in ckpt):
                break
        except Exception:
            pass  # mid-rename read
        for p in hosts:
            assert p.poll() is None, p.communicate()
        time.sleep(0.5)
    else:
        raise AssertionError("phase-A checkpoints never reached 2 sectors")

    # kill host 1 mid-stream; the survivor must finish ITS feed and exit
    # cleanly within a bound (not block, not wait for the ~90 s fatal)
    hosts[1].send_signal(signal.SIGKILL)
    hosts[1].wait(timeout=30)
    _produce(ports[0][0], 2, start=2)
    t0 = time.monotonic()
    out, err = hosts[0].communicate(timeout=120)
    waited = time.monotonic() - t0
    assert hosts[0].returncode == 0, (out[-300:], err[-2000:])
    assert waited < 80, waited
    assert json.loads(out)["processed_sectors"] == 4
    assert VolumeScan.load(str(ckpt[0])).coverage.sum() == 4
    assert VolumeScan.load(str(ckpt[1])).coverage.sum() == 2

    # ---- phase B: restart both hosts; the dead host's feed resumes ----
    hosts, ready = _launch_lockstep_hosts(
        tmp_path, _free_port(), ports, ckpt, "b", max_sectors=2)
    _await_ready(hosts, ready)
    for pid in range(2):
        _produce(ports[pid][0], 2, start=2)
    for pid, p in enumerate(hosts):
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, (pid, out[-300:], err[-2000:])
        stats = json.loads(out)
        assert stats["processed_sectors"] == 2, (pid, stats)
    for pid in range(2):
        vs = VolumeScan.load(str(ckpt[pid]))
        assert vs.coverage.sum() == 4, (pid, vs.coverage.sum())
        assert vs.coverage[:4, 0].all()   # sectors 0-3, elevation 0


def test_two_host_lockstep_streaming(tmp_path):
    """Two `cli stream` processes form one mesh (--coordinator); each host
    ingests its own UDP feed and publishes its own sectors' products —
    the reference's producer->processor->consumer dataflow sharded 2 ways."""
    coord_port = _free_port()
    hosts = []
    ports = [(_free_port(), _free_port(), _free_port()) for _ in range(2)]
    ready = [tmp_path / f"ready{pid}" for pid in range(2)]
    for pid in range(2):
        ing, zdb, zdr = ports[pid]
        env = {
            "JAX_PLATFORM_NAME": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": str(REPO),
        }
        hosts.append(subprocess.Popen(
            [sys.executable, "-m", "wrp_tpu.cli", "stream",
             "--transport", "udp", "--ingest-port", str(ing),
             "--zdb-port", str(zdb), "--zdr-port", str(zdr),
             "--batch", "2", "--max-sectors", "2", "--timeout", "60",
             "--ready-file", str(ready[pid]),
             "--coordinator", f"127.0.0.1:{coord_port}",
             "--num-hosts", "2", "--host-id", str(pid)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))

    import time

    # readiness handshake, not a guessed sleep: each host touches its
    # --ready-file after mesh join + warmup compile + ingest bind
    deadline = time.monotonic() + 180
    while not all(r.exists() for r in ready):
        for p in hosts:
            assert p.poll() is None, p.communicate()
        assert time.monotonic() < deadline, "hosts never became ready"
        time.sleep(0.5)
    for pid in range(2):
        subprocess.run(
            [sys.executable, "-m", "wrp_tpu.cli", "produce",
             "--transport", "udp", "--ingest-port", str(ports[pid][0]),
             "--sectors", "2", "--headers"],
            cwd=REPO, check=True, capture_output=True, timeout=120)

    import json

    for pid, p in enumerate(hosts):
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        assert p.returncode == 0, (pid, out[-500:], err[-2000:])
        stats = json.loads(out)
        assert stats["processed_sectors"] == 2, (pid, stats)


def test_pulse_shard_blocked_collective_bounded_abort(tmp_path):
    """VERDICT r3 item 3: fire the blocked-collective abort against a
    REAL blocked collective.  The data-parallel lock-step step compiles
    to no cross-host collective, so the earlier dead-peer tests only
    exercised the no-progress bound; --pulse-shard's step carries a
    cross-host all_to_all + all_gather (sharded.py seq path), so a
    frozen peer leaves the survivor's compute thread genuinely stuck
    inside XLA.  SIGSTOP (not SIGKILL) freezes host 1 with its gloo
    sockets open — the true silent-peer condition: no error, no reset,
    no progress — then host 0 gets a full batch, dispatches, and blocks
    in the collective.  _StallWatchdog.on_timeout (executor.py) must
    end the process from the watchdog thread: exit code 3, volume
    checkpoint saved, diagnostic naming the blocked step."""
    import json
    import signal
    import time

    coord_port = _free_port()
    ports = [(_free_port(), _free_port(), _free_port()) for _ in range(2)]
    ready = [tmp_path / f"ready{pid}" for pid in range(2)]
    ckpt = [tmp_path / f"vol{pid}.npz" for pid in range(2)]
    hosts = []
    for pid in range(2):
        ing, zdb, zdr = ports[pid]
        env = {
            "JAX_PLATFORM_NAME": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": str(REPO),
        }
        hosts.append(subprocess.Popen(
            [sys.executable, "-m", "wrp_tpu.cli", "stream",
             "--transport", "udp", "--ingest-port", str(ing),
             "--zdb-port", str(zdb), "--zdr-port", str(zdr),
             "--batch", "2", "--max-sectors", "4", "--timeout", "5",
             "--method", "fft", "--pulse-shard",
             "--ready-file", str(ready[pid]),
             "--checkpoint", str(ckpt[pid]),
             "--collective-timeout", "15",
             "--coordinator", f"127.0.0.1:{coord_port}",
             "--num-hosts", "2", "--host-id", str(pid)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))
    try:
        deadline = time.monotonic() + 180
        while not all(r.exists() for r in ready):
            for p in hosts:
                assert p.poll() is None, p.communicate()
            assert time.monotonic() < deadline, "hosts never became ready"
            time.sleep(0.5)

        # freeze host 1 (sockets stay open: the collective BLOCKS rather
        # than erroring), then give host 0 a full batch so it dispatches
        hosts[1].send_signal(signal.SIGSTOP)
        subprocess.run(
            [sys.executable, "-m", "wrp_tpu.cli", "produce",
             "--transport", "udp", "--ingest-port", str(ports[0][0]),
             "--sectors", "2", "--headers", "--rate", "4"],
            cwd=REPO, check=True, capture_output=True, timeout=120)

        t0 = time.monotonic()
        out, err = hosts[0].communicate(timeout=120)
        waited = time.monotonic() - t0
        assert hosts[0].returncode == 3, (hosts[0].returncode, out[-500:],
                                          err[-3000:])
        # the on_timeout path, not the exception path: the diagnostic
        # names the step the thread is stuck in and the timeout bound
        assert "collective dispatch blocked/failed" in err, err[-3000:]
        assert "collective timeout 15.0" in err, err[-3000:]
        assert ckpt[0].exists()          # checkpoint saved from the abort
        stats = json.loads(err.strip().splitlines()[-1])
        assert "processed_sectors" in stats
        assert waited < 100, waited      # bounded, not a wedged mesh
    finally:
        # host 1 is SIGSTOPped: nothing will ever resume it — reap it
        for p in hosts:
            if p.poll() is None:
                p.send_signal(signal.SIGKILL)
                p.wait(timeout=30)


MISALIGN_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from wrp_tpu.config import tiny_config
from wrp_tpu import pipeline
from wrp_tpu.parallel.multihost import PulseShardedProcessor, init_distributed

init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
cfg = tiny_config(m=64, n=32)
B = 4
rng = np.random.default_rng(7)
iq = (rng.integers(-2048, 2048, (B, *cfg.sector_shape))
      + 1j * rng.integers(-2048, 2048, (B, *cfg.sector_shape)))
planar = pipeline.to_planar(iq.astype(np.complex64))
proc = PulseShardedProcessor.build(cfg, batch=B, method="mxu")

# aligned labels: the check passes and products come back
labels = np.stack([np.arange(B), np.zeros(B)], axis=1).astype(np.int32)
zdb, zdr = proc.step_local(planar, labels=labels)
assert zdb.shape == (B, cfg.num_output_bins)

# host 1 shifts its labels by one (a dropped wire sector): EVERY host
# must refuse the step loudly instead of mixing pulse columns
bad = labels + (1 if pid == 1 else 0)
try:
    proc.step_local(planar, labels=bad)
except RuntimeError as e:
    assert "misaligned" in str(e), e
    print(f"MISALIGN_CAUGHT pid={pid}", flush=True)
else:
    print(f"MISALIGN_MISSED pid={pid}", flush=True)
"""


def test_pulse_shard_misaligned_batch_refused():
    """A dropped wire sector on one host shifts its batch slots; the
    pulse-sharded step must refuse the batch on EVERY host (naming the
    slot) rather than let the cross-host all_to_all silently mix pulse
    columns from different sectors."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", MISALIGN_WORKER, str(pid), "2",
             str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        assert "MISALIGN_CAUGHT" in out, (pid, p.returncode, out,
                                          err[-2000:])


import pytest


@pytest.mark.parametrize("method_args", [
    ["--method", "fft"],
    # the flagship kernel, seq-sharded, with the on-chip wire decode:
    # `stream --pulse-shard --method pallas --device-decode` is the
    # redundant-fleet deployment VERDICT r4 item 2 unlocks
    ["--method", "pallas", "--device-decode"],
], ids=["fft", "pallas-device-decode"])
def test_pulse_shard_one_broadcast_wire(tmp_path, method_args):
    """The reference's actual fan-out (udpbroadcast.cpp:30 sends to
    INADDR_BROADCAST): ONE producer broadcasts, every pulse-shard host
    binds the SAME port (SO_REUSEPORT) and receives every sector from
    the one wire — no per-host feeds.  Both hosts must produce the full
    identical volume (N-way redundancy)."""
    import json
    import time

    from wrp_tpu.runtime import VolumeScan

    coord_port = _free_port()
    ing = _free_port()                       # ONE shared ingest port
    ready = [tmp_path / f"ready{pid}" for pid in range(2)]
    ckpt = [tmp_path / f"vol{pid}.npz" for pid in range(2)]
    hosts = []
    for pid in range(2):
        env = {
            "JAX_PLATFORM_NAME": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": str(REPO),
        }
        hosts.append(subprocess.Popen(
            [sys.executable, "-m", "wrp_tpu.cli", "stream",
             "--transport", "udp", "--ingest-port", str(ing),
             "--zdb-port", str(_free_port()),
             "--zdr-port", str(_free_port()),
             "--batch", "2", "--max-sectors", "2", "--timeout", "60",
             *method_args, "--pulse-shard",
             "--ready-file", str(ready[pid]),
             "--checkpoint", str(ckpt[pid]),
             "--coordinator", f"127.0.0.1:{coord_port}",
             "--num-hosts", "2", "--host-id", str(pid)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))

    deadline = time.monotonic() + 180
    while not all(r.exists() for r in ready):
        for p in hosts:
            assert p.poll() is None, p.communicate()
        assert time.monotonic() < deadline, "hosts never became ready"
        time.sleep(0.5)

    # ONE producer, broadcasting on the loopback broadcast address:
    # both hosts' sockets receive every datagram
    subprocess.run(
        [sys.executable, "-m", "wrp_tpu.cli", "produce",
         "--transport", "udp", "--host", "127.255.255.255",
         "--ingest-port", str(ing), "--sectors", "2", "--headers",
         "--rate", "2"],
        cwd=REPO, check=True, capture_output=True, timeout=120)

    vols = []
    for pid, p in enumerate(hosts):
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, (pid, out[-500:], err[-2000:])
        stats = json.loads(out[out.index("{"):])
        assert stats["processed_sectors"] == 2, (pid, stats)
        vols.append(VolumeScan.load(str(ckpt[pid])))
    assert (vols[0].coverage == vols[1].coverage).all()
    assert int(vols[0].coverage.sum()) == 2
    f = np.isfinite(vols[0].data)
    assert np.allclose(vols[0].data[f], vols[1].data[np.isfinite(
        vols[1].data)])
