"""Parse a jax.profiler trace (perfetto JSON) into per-op device-time totals.

Usage: python scripts/parse_trace.py LOGDIR [--steps N] [--top K] [--like SUBSTR]

Finds the newest ``*.trace.json.gz`` under LOGDIR, keeps events on TPU/device
tracks, groups by op name, and prints total device time (and /step if --steps).
This is the tool behind the per-op budget in CLAUDE.md (the reference has no
profiling story at all — SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_trace(logdir: str) -> dict:
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def device_pids(trace: dict) -> set:
    """pids whose process_name metadata looks like a TPU device track."""
    pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name.lower() or "Device" in name:
                pids.add(ev["pid"])
    return pids


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--steps", type=int, default=3,
                   help="steps captured in the trace (divide totals)")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--like", default=None,
                   help="only ops whose name/long_name contains SUBSTR")
    p.add_argument("--long", action="store_true",
                   help="group by long_name (HLO metadata) instead of op name")
    args = p.parse_args(argv)

    trace = load_trace(args.logdir)
    pids = device_pids(trace)
    if not pids:
        print("WARNING: no device-track process metadata matched — totals "
              "below include HOST events and are NOT device time",
              file=sys.stderr)
    groups = collections.defaultdict(lambda: [0.0, 0, ""])  # us, count, sample long
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if pids and ev.get("pid") not in pids:
            continue
        name = ev.get("name", "")
        long_name = ev.get("args", {}).get("long_name", "")
        if args.like and args.like not in name and args.like not in long_name:
            continue
        key = long_name or name if args.long else name
        g = groups[key]
        g[0] += ev["dur"]
        g[1] += 1
        if not g[2]:
            g[2] = long_name
        total += ev["dur"]

    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])
    print(f"{'us/step':>10} {'count':>6}  name")
    for name, (us, cnt, long_name) in rows[: args.top]:
        label = name if args.long or not long_name else f"{name}  [{long_name[:90]}]"
        print(f"{us / args.steps:10.1f} {cnt:6d}  {label[:160]}")
    kind = "filtered total" if args.like else "total"
    scope = "device time" if pids else "time (NO pid filter — includes host)"
    print(f"\n{kind} {scope}: {total / args.steps / 1000:.2f} ms/step "
          f"({len(groups)} distinct ops)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
