"""Per-round perf regression diff — the CK perf-CI role.

CK's CI pipes ckProfiler output into an SQL database and flags per-shape
movement (``script/process_perf_data.py:239``); here the ckprof ``--json``
JSONL logs are the database and this script is the query: compare two
round logs keyed by (op, instance, problem) and report regressions.

Usage:
    python scripts/perf_diff.py docs/perf/r2.jsonl docs/perf/r3.jsonl
    python scripts/perf_diff.py old.jsonl new.jsonl --threshold 0.05
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load(path):
    rows = {}
    for line in Path(path).read_text().splitlines():
        if not line.strip():
            continue
        r = json.loads(line)
        key = (r.get("op"), r.get("instance"), r.get("m"), r.get("n"),
               r.get("k"), r.get("dtype"))
        rows[key] = r  # last write wins (rerun refreshes)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.03,
                    help="relative slowdown that counts as a regression")
    ns = ap.parse_args()
    old, new = load(ns.old), load(ns.new)

    regressions, improvements, added, removed = [], [], [], []
    for key, r_new in sorted(new.items(), key=str):
        r_old = old.get(key)
        if r_old is None:
            added.append(key)
            continue
        if not (r_old.get("avg_ms") and r_new.get("avg_ms")):
            continue
        rel = r_new["avg_ms"] / r_old["avg_ms"] - 1.0
        row = (key, r_old["avg_ms"], r_new["avg_ms"], rel)
        if rel > ns.threshold:
            regressions.append(row)
        elif rel < -ns.threshold:
            improvements.append(row)
    removed = [k for k in old if k not in new]

    def show(title, rows):
        if not rows:
            return
        print(f"\n{title}:")
        for key, a, b, rel in rows:
            op, inst, m, n, k, dt = key
            print(f"  {op:>16s} {inst or '':40s} {m}x{n}x{k} {dt or '':5s} "
                  f"{a:9.4f} -> {b:9.4f} ms ({rel:+.1%})")

    show("REGRESSIONS", regressions)
    show("improvements", improvements)
    if added:
        print(f"\n{len(added)} new rows (no baseline)")
    if removed:
        print(f"{len(removed)} rows dropped since baseline")
    if not (regressions or improvements):
        print("no movement beyond threshold")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
