#!/usr/bin/env python3
"""Compare two graft Bench JSON lines (dev utility, not part of the build).

Usage: python3 bench_history/diff.py OLD.json NEW.json [threshold_pct]

Prints per-query deltas exceeding the threshold (default 30% — this
box's run-to-run noise floor) plus queries added/removed, so a round
can spot real regressions instead of chasing noise.
"""
import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.30
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    for q in sorted(set(old) - set(new)):
        print(f"REMOVED  {q}")
    for q in sorted(set(new) - set(old)):
        print(f"ADDED    {q:28s} {new[q]:.2f}s")
    for q in sorted(set(old) & set(new)):
        if old[q] <= 0 or new[q] <= 0:
            continue
        rel = new[q] / old[q] - 1.0
        if abs(rel) >= thr:
            tag = "SLOWER" if rel > 0 else "FASTER"
            print(f"{tag:8s} {q:28s} {old[q]:.2f}s -> {new[q]:.2f}s ({rel:+.0%})")
    ot = sum(v for v in old.values() if v > 0)
    nt = sum(v for v in new.values() if v > 0)
    print(f"TOTAL    {ot:.2f}s -> {nt:.2f}s ({nt / ot - 1.0:+.0%})")


if __name__ == "__main__":
    main()
