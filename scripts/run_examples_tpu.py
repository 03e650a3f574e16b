"""Run every example on the real chip and log verification results.

The reference compiles + runs its examples as tests per arch
(``test/CMakeLists.txt:10-62`` add_test_executable; ``Jenkinsfile:756+``
per-arch matrix); each example binary exits nonzero on verification
failure (``example/64_fpAintB_gemm/run_gemm_example.inc:155-163``). This
is the on-TPU analog: each ``examples/NN_*.py`` is executed in its own
process (serially — two TPU processes cannot share the chip, CLAUDE.md),
its exit code and Perf:/verification lines are captured, and a jsonl row
per example lands in ``docs/perf/examples_r{N}.jsonl``.

Usage: python scripts/run_examples_tpu.py [--round N] [--timeout SEC]
       [--only 01,05,...]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated example number prefixes")
    ap.add_argument("--cpu", action="store_true",
                    help="CKT_EXAMPLES_CPU=1 smoke (CI mode)")
    args = ap.parse_args()

    examples = sorted((REPO / "examples").glob("[0-9][0-9]_*.py"))
    if args.only:
        keep = set(args.only.split(","))
        examples = [e for e in examples if e.name[:2] in keep]
    out_path = REPO / "docs" / "perf" / f"examples_r{args.round}.jsonl"
    out_path.parent.mkdir(parents=True, exist_ok=True)

    rows = []
    n_fail = 0
    for ex in examples:
        t0 = time.time()
        env = dict(__import__("os").environ)
        if args.cpu:
            env["CKT_EXAMPLES_CPU"] = "1"
        try:
            proc = subprocess.run(
                [sys.executable, str(ex)], cwd=str(REPO / "examples"),
                capture_output=True, text=True, timeout=args.timeout,
                env=env,
            )
            rc = proc.returncode
            tail = (proc.stdout + proc.stderr)[-4000:]
        except subprocess.TimeoutExpired as e:
            rc = -1
            tail = f"TIMEOUT after {args.timeout}s: " + str(
                (e.stdout or b"")[-500:]
            )
        dt = time.time() - t0
        perf_lines = re.findall(r"Perf: [^\n]*", tail)
        # examples exit nonzero on verification failure (the CK example
        # contract, run_gemm_example.inc:155-163), so rc==0 IS the verify
        # gate; the FAILED guard catches prints that don't raise
        verified = rc == 0 and "FAILED" not in tail
        row = {
            "example": ex.name,
            "rc": rc,
            "verified": verified,
            "seconds": round(dt, 1),
            "perf": perf_lines[:8],
        }
        if rc != 0:
            n_fail += 1
            row["tail"] = tail[-1500:]
        rows.append(row)
        print(json.dumps({k: row[k] for k in ("example", "rc", "verified",
                                              "seconds")}), flush=True)

    merged = {}
    if out_path.exists():
        # --only reruns update their rows without dropping the rest
        for line in out_path.read_text().splitlines():
            if line.strip():
                r = json.loads(line)
                merged[r["example"]] = r
    for row in rows:
        merged[row["example"]] = row
    with open(out_path, "w") as f:
        for name in sorted(merged):
            f.write(json.dumps(merged[name]) + "\n")
    print(f"{len(rows) - n_fail}/{len(rows)} examples passed -> {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
