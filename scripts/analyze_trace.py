"""Aggregate device-op time from a jax.profiler trace.

Usage:
  python scripts/analyze_trace.py <logdir-or-trace.json.gz> [top_n]

Captures with jax.profiler.trace(logdir) write
  <logdir>/plugins/profile/<run>/<host>.trace.json.gz
(a Chrome-trace JSON).  This tool finds the newest one, sums wall
duration per TPU op across the trace's device lanes, and prints the
top-N ops with totals — the ground truth for where an in-graph
millisecond actually goes (scan-slope ablations can't see fusion).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    pats = [
        os.path.join(path, "**", "*.trace.json.gz"),
        os.path.join(path, "**", "*.trace.json"),
    ]
    files = [f for p in pats for f in glob.glob(p, recursive=True)]
    if not files:
        raise SystemExit(f"no trace.json[.gz] under {path}")
    return max(files, key=os.path.getmtime)


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as fh:
        data = json.load(fh)
    return data.get("traceEvents", data if isinstance(data, list) else [])


def main():
    path = find_trace(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events = load_events(path)

    # pid -> process name; device lanes look like "/device:TPU:0" or
    # "TPU:0" (CPU-only traces: "/host:CPU" — still useful)
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")

    device_pids = {
        pid for pid, n in pnames.items()
        if "TPU" in n.upper() or "GPU" in n.upper()
    }
    if not device_pids:  # CPU trace fallback: take every complete-event pid
        device_pids = {e["pid"] for e in events if e.get("ph") == "X"}

    # events nest (module envelope > op); restrict to the per-op thread
    # lanes ("XLA Ops"/"TensorFlow Ops") when named, else drop envelopes
    # whose name looks like a jit module fingerprint
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e.get("args", {}).get("name", "")
    op_tids = {
        k for k, n in tnames.items()
        if ("XLA Ops" in n or "TensorFlow Ops" in n) and k[0] in device_pids
    }

    total = collections.Counter()
    count = collections.Counter()
    span_lo, span_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if op_tids and (e["pid"], e.get("tid")) not in op_tids:
            continue
        if not op_tids and e.get("name", "").startswith("jit"):
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        total[name] += dur
        count[name] += 1
        ts = float(e.get("ts", 0.0))
        span_lo = min(span_lo, ts)
        span_hi = max(span_hi, ts + dur)

    grand = sum(total.values())
    span = max(span_hi - span_lo, 1e-9)
    print(f"trace: {path}")
    print(f"device lanes: {sorted(pnames.get(p, str(p)) for p in device_pids)}")
    print(f"sum of op durations: {grand/1e3:.2f} ms over a {span/1e3:.2f} ms span\n")
    print(f"{'op':<72} {'total ms':>9} {'n':>6} {'%':>6}")
    for name, dur in total.most_common(top_n):
        print(f"{name[:72]:<72} {dur/1e3:9.3f} {count[name]:6d} {100*dur/grand:5.1f}%")


if __name__ == "__main__":
    main()
