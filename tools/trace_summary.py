#!/usr/bin/env python
"""Summarise a jax.profiler trace (bench.py --profile DIR) into op-level
time totals — the nvprof-style per-kernel hot list (SURVEY.md section 6)
for TPU runs, without needing tensorboard.

The profiler writes chrome-trace JSON under
DIR/plugins/profile/<run>/<host>.trace.json.gz; complete events ("ph":"X")
carry name + dur (microseconds).  We aggregate wall time per event name,
per process/"resource" (TensorCore vs host threads), and print the top-N.

Usage: python tools/trace_summary.py /tmp/trace_dir [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_traces(root):
    pats = [
        os.path.join(root, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(root, "**", "*.trace.json.gz"),
        os.path.join(root, "**", "*.trace.json"),
    ]
    out = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
        if out:
            break
    return sorted(set(out))


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        doc = json.load(f)
    return doc.get("traceEvents", [])


def summarise(events, top=25):
    # map pid -> process name (e.g. "/device:TPU:0" vs host threads)
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", str(e["pid"]))
    per_proc = collections.defaultdict(
        lambda: collections.defaultdict(float))
    counts = collections.defaultdict(
        lambda: collections.defaultdict(int))
    spans = collections.defaultdict(lambda: [float("inf"), 0.0])
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        proc = pnames.get(e.get("pid"), str(e.get("pid")))
        name = e.get("name", "?")
        per_proc[proc][name] += e["dur"]
        counts[proc][name] += 1
        s = spans[proc]
        s[0] = min(s[0], e["ts"])
        s[1] = max(s[1], e["ts"] + e["dur"])
    out = {}
    for proc, totals in per_proc.items():
        rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        span = spans[proc][1] - spans[proc][0]
        out[proc] = {
            "span_ms": round(span / 1e3, 3),
            "ops": [
                {"name": n, "total_ms": round(t / 1e3, 3),
                 "calls": counts[proc][n],
                 "pct_of_span": round(100 * t / span, 1) if span else 0.0}
                for n, t in rows
            ],
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", action="store_true",
                    help="machine-readable output")
    args = ap.parse_args()
    paths = find_traces(args.trace_dir)
    if not paths:
        print(f"no trace files under {args.trace_dir}", file=sys.stderr)
        return 1
    # Summarise each trace file independently and merge under
    # file-qualified process names: per-host trace files reuse the same
    # pids and have unsynchronised clocks, so concatenating their event
    # lists would sum distinct processes' op totals and corrupt spans.
    summary = {}
    for p in paths:
        per_file = summarise(load_events(p), args.top)
        prefix = "" if len(paths) == 1 else (
            os.path.basename(p).split(".")[0] + ":")
        for proc, info in per_file.items():
            summary[prefix + proc] = info
    if args.json:
        print(json.dumps(summary))
        return 0
    for proc, info in sorted(summary.items()):
        print(f"\n== {proc}  (span {info['span_ms']} ms)")
        for r in info["ops"]:
            print(f"  {r['total_ms']:>10.3f} ms  {r['calls']:>6}x "
                  f"{r['pct_of_span']:>5.1f}%  {r['name'][:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
