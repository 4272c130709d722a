#!/usr/bin/env python
"""Bench regression gate (VERDICT r4 #2).

Compares a fresh bench.py JSON line against the previous round's recorded
BENCH_r*.json and fails loudly on a component regression, so a perf loss
like round 4's (-29% device-only hidden in stderr prose) is caught at
commit time rather than by the judge.

Usage:
    python bench.py 512 8 | tail -1 > /tmp/bench_new.json
    python tools/bench_gate.py /tmp/bench_new.json [--tolerance 0.10]

The baseline is the newest BENCH_r*.json in the repo root whose payload
carries the component fields (older rounds recorded only the headline;
for those, only the headline is gated).  Box noise on this 1-core host is
+-15% run-to-run (CLAUDE.md), so the default tolerance is 10% against the
previous round's DRIVER capture — treat a failure as "re-run and
investigate", not as proof by itself.

Exit status: 0 = no regression beyond tolerance, 1 = regression, 2 = bad
invocation / missing files.
"""
import argparse
import glob
import json
import os
import re
import sys

# higher-is-better component fields gated against the previous round
GATED = ["value", "parse_only_x", "device_only_x"]
# lower-is-better fields
GATED_LOW = ["wire_bytes_per_frame_lane", "parse_us_per_frame"]


def load_baseline(root: str):
    """Newest BENCH_r*.json payload (the driver wraps it in {"parsed"})."""
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    for p in reversed(paths):
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        payload = d.get("parsed", d)
        if isinstance(payload, dict) and payload.get("value"):
            return p, payload
    return None, None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("new_json", help="file holding the fresh bench JSON line")
    ap.add_argument("--tolerance", type=float, default=0.10,
                    help="allowed fractional regression (default 0.10)")
    ap.add_argument("--baseline", default=None,
                    help="explicit baseline JSON (default: newest BENCH_r*)")
    args = ap.parse_args(argv)

    try:
        with open(args.new_json) as f:
            new = json.loads(f.read().strip().splitlines()[-1])
    except (OSError, ValueError, IndexError) as e:
        print(f"bench_gate: cannot read {args.new_json}: {e}")
        return 2
    if args.baseline:
        base_path = args.baseline
        with open(base_path) as f:
            d = json.load(f)
        base = d.get("parsed", d)
    else:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        base_path, base = load_baseline(root)
    if base is None:
        print("bench_gate: no baseline BENCH_r*.json found — nothing to "
              "gate against (pass)")
        return 0

    print(f"bench_gate: baseline {base_path}")
    failed = []
    for key in GATED:
        b, n = base.get(key), new.get(key)
        if not b or n is None:
            continue
        delta = (n - b) / b
        tag = "REGRESSION" if delta < -args.tolerance else "ok"
        print(f"  {key:28s} {b:>12.2f} -> {n:>12.2f}  ({delta:+.1%}) {tag}")
        if delta < -args.tolerance:
            failed.append(key)
    for key in GATED_LOW:
        b, n = base.get(key), new.get(key)
        if not b or n is None:
            continue
        delta = (n - b) / b
        tag = "REGRESSION" if delta > args.tolerance else "ok"
        print(f"  {key:28s} {b:>12.2f} -> {n:>12.2f}  ({delta:+.1%}) {tag}")
        if delta > args.tolerance:
            failed.append(key)
    if failed:
        print(f"bench_gate: FAIL — component regression beyond "
              f"{args.tolerance:.0%}: {', '.join(failed)}")
        return 1
    print("bench_gate: pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
