#!/usr/bin/env python3
"""Cross-round per-query bench trend (r8 verdict item 7).

Reads the committed canonical sf0.1 runs (bench_history/r*_sf0.1.json
plus the repo-root BENCH.json as the current round) and emits
bench_history/TREND.md: a query x round seconds matrix, plus a
regression flag list comparing each query's latest two measurements
(only canonical committed runs -- driver runs carry co-tenant noise and
are excluded by construction).

Usage: python3 bench_history/trend.py [> /dev/null]; writes TREND.md.
"""
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# regression flag threshold between a query's last two canonical
# measurements; sub-second queries get extra slack (noise floor)
RATIO_FLAG = 1.5
MIN_SECONDS = 0.5

# canonical r*_sf0.1.json files store medians rounded to 3 decimals;
# BENCH.json stores full precision — so the cur-dedupe must compare
# within the rounding quantum, never with dict equality (r15 verdict:
# the == check silently failed the moment BENCH.json was refreshed
# with the same canonical pass, and TREND's last-Δ column compared
# the round to ITSELF)
ROUND_TOL = 5e-4 + 1e-9


def same_run(a, b, tol=ROUND_TOL):
    """True when two queries dicts are the same measurement up to the
    canonical file's 3-decimal rounding."""
    return set(a) == set(b) and all(abs(a[q] - b[q]) <= tol for q in a)


def load_rounds():
    rounds = []
    for path in sorted(glob.glob(os.path.join(HERE, "r*_sf0.1.json"))):
        m = re.match(r"r(\d+)_sf0\.1\.json$", os.path.basename(path))
        if not m:
            continue
        rounds.append((int(m.group(1)), path))
    rounds.sort()
    labels, runs = [], []
    for n, path in rounds:
        with open(path) as f:
            runs.append(json.load(f).get("queries", {}))
        labels.append(f"r{n}")
    cur = os.path.join(ROOT, "BENCH.json")
    if os.path.exists(cur):
        with open(cur) as f:
            d = json.load(f)
        q = d.get("queries", {})
        # BENCH.json may BE the newest committed r*_sf0.1.json (dedupe
        # within the rounding quantum), and the driver's own reruns
        # self-flag contention suspects — those carry co-tenant noise
        # and are excluded by this file's own policy, not tabulated
        if d.get("contention_suspect"):
            pass
        elif not runs or not same_run(q, runs[-1]):
            runs.append(q)
            labels.append("cur")
    return labels, runs


def selftest():
    """Regression test for the cur-dedupe (r15 verdict item 1):
    rounded-vs-unrounded twins must dedupe; real differences must not;
    suspect-flagged runs must be excluded regardless."""
    full = {"q01": 1.660442955, "q02": 0.123456789}
    rounded = {q: round(v, 3) for q, v in full.items()}
    assert same_run(full, rounded), "rounded twin must dedupe"
    assert same_run(rounded, full), "dedupe must be symmetric"
    moved = dict(full, q01=1.662)  # > the 0.0005 rounding quantum
    assert not same_run(moved, rounded), "a real change must NOT dedupe"
    assert not same_run({"q01": 1.66}, rounded), "key sets must match"
    # the load_rounds policy bits, driven through a temp tree
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        hist = os.path.join(td, "bench_history")
        os.mkdir(hist)
        with open(os.path.join(hist, "r1_sf0.1.json"), "w") as f:
            json.dump({"queries": rounded}, f)
        globals_save = (globals()["HERE"], globals()["ROOT"])
        try:
            globals()["HERE"], globals()["ROOT"] = hist, td
            bench = os.path.join(td, "BENCH.json")
            with open(bench, "w") as f:
                json.dump({"queries": full}, f)
            labels, _ = load_rounds()
            assert labels == ["r1"], f"rounded twin tabulated: {labels}"
            with open(bench, "w") as f:
                json.dump({"queries": moved}, f)
            labels, _ = load_rounds()
            assert labels == ["r1", "cur"], f"real run dropped: {labels}"
            with open(bench, "w") as f:
                json.dump({"queries": moved,
                           "contention_suspect": ["q01"]}, f)
            labels, _ = load_rounds()
            assert labels == ["r1"], f"suspect run tabulated: {labels}"
        finally:
            globals()["HERE"], globals()["ROOT"] = globals_save
    print("selftest OK")


def main():
    labels, runs = load_rounds()
    queries = sorted({q for r in runs for q in r})
    lines = [
        "# Per-query bench trend — committed canonical sf0.1 runs only",
        "",
        "Driver `BENCH_r{N}.json` runs are excluded: they carry",
        "co-tenant contention (adjudicated r7/r8); this table is the",
        "machine-limited truth per round. `-` = query did not exist yet.",
        "",
        "| query | " + " | ".join(labels) + " | last Δ |",
        "|---| " + " | ".join("---" for _ in labels) + " |---|",
    ]
    flags = []
    for q in queries:
        vals = [r.get(q) for r in runs]
        cells = ["-" if v is None else f"{v:.2f}" for v in vals]
        present = [v for v in vals if v is not None]
        delta = ""
        if len(present) >= 2:
            prev, last = present[-2], present[-1]
            if prev > 0:
                ratio = last / prev
                delta = f"{ratio:.2f}x"
                if ratio > RATIO_FLAG and last > MIN_SECONDS:
                    delta += " ⚠"
                    flags.append((q, prev, last, ratio))
        lines.append(f"| {q} | " + " | ".join(cells) + f" | {delta} |")

    totals = ["%.1f" % sum(v for v in r.values()) for r in runs]
    lines += ["", "| total | " + " | ".join(totals) + " | |", ""]
    if flags:
        lines.append("## Flagged (last-two ratio > %.1fx and > %.1fs)" % (RATIO_FLAG, MIN_SECONDS))
        lines.append("")
        for q, prev, last, ratio in sorted(flags, key=lambda t: -t[3]):
            lines.append(f"- **{q}**: {prev:.2f}s → {last:.2f}s ({ratio:.2f}x)")
    else:
        lines.append("No per-query regressions flagged between the last two rounds.")
    out = os.path.join(HERE, "TREND.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(queries)} queries x {len(labels)} rounds, {len(flags)} flagged")


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest()
    else:
        main()
