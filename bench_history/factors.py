#!/usr/bin/env python3
"""Emit a per-query scaling-factor table from two graft Bench artifacts.

Usage: python3 bench_history/factors.py SMALL.json BIG.json [ratio_label] [--min]

Prints a markdown table sorted by factor (descending) plus the total,
the same shape as SCALING_r4.md — so a round's scale rehearsal is a
two-command artifact instead of a hand-built one.

--min uses the per-query MINIMUM of the 3 interleaved passes (from the
artifact's "spread") instead of the median: under heavy co-tenancy a
single external burst can contaminate 2 of 3 passes, and the min is
the best available estimate of the machine-limited time.
"""
import json
import sys


def load(path: str, use_min: bool) -> dict:
    d = json.load(open(path))
    if use_min and "spread" in d:
        return {q: min(v) for q, v in d["spread"].items() if v}
    return d["queries"]


def main() -> None:
    use_min = "--min" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--min"]
    small = load(args[0], use_min)
    big = load(args[1], use_min)
    label = args[2] if len(args) > 2 else "factor"
    rows = []
    for q in sorted(set(small) & set(big)):
        if small[q] <= 0 or big[q] <= 0:
            continue
        rows.append((q, small[q], big[q], big[q] / small[q]))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | small s | big s | {label} |")
    print("|---|---|---|---|")
    for q, s, b, f in rows:
        print(f"| {q} | {s:.2f} | {b:.2f} | {f:.1f}x |")
    ts = sum(r[1] for r in rows)
    tb = sum(r[2] for r in rows)
    print(f"\nTotal: {ts:.1f}s -> {tb:.1f}s = {tb / ts:.2f}x")


if __name__ == "__main__":
    main()
