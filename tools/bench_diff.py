#!/usr/bin/env python3
"""Mechanical plan-metrics regression gate (round-5 verdict item #5).

Diffs two bench snapshots (each one JSON line with "queries" seconds and
"plan_metrics" [shuffle_rows, shuffle_bytes, spill_bytes] per query) on
their COMMON query surface and fails on:
  - shuffle-row growth  > --max-row-growth (default 2.0x) for any query
  - NEW nonzero spill for a query that previously spilled nothing
Queries present in only one snapshot are listed (informational) but never
fail the gate: new queries have no baseline, removed queries have no
current plan. Times are reported but never gated — records are
data-deterministic, wall-clock is not.

The --min-rows floor (default 100k) applies ONLY when the PREVIOUS
count is tiny (< 100 rows): iterative driver-loop queries
(kmeans/BPE/pagerank) race the QueryExecutionListener — the recorded
sub-execution varies run to run, so their tiny counts (1 vs 16) would
flap a pure ratio gate. A query with a real prior volume (>= 100 rows)
keeps the live ratio verdict at ANY current count — a 4k -> 90k
explosion is a regression even though 90k < 100k (round-6 advice:
a blanket floor silently exempted every sub-100k query).

--waive NAME,NAME waives the growth verdict for queries whose plan shape
changed ON PURPOSE this round (a reviewed rework, documented in
BASELINE.md). Waived rows print loudly as WAIVED — never silently — and
the NEW-spill verdict still applies to them. A waiver is a per-run
argument, not a config: next round's diff (new baseline = this round's
snapshot) runs un-waived again.

Usage: bench_diff.py <previous.json> <current.json>
         [--max-row-growth X] [--min-rows N] [--waive a,b,c]
Exit 0 = clean, 1 = regression, 2 = unreadable input.
"""
import json
import sys


def load(path):
    try:
        with open(path) as f:
            d = json.load(f)
        return d.get("queries", {}), d.get("plan_metrics", {})
    except Exception as e:
        print(f"ERROR cannot read {path}: {e}")
        sys.exit(2)


def main():
    flagvals = set()
    growth = 2.0
    min_rows = 100_000
    waived = set()
    for i, a in enumerate(sys.argv):
        if a == "--max-row-growth":
            growth = float(sys.argv[i + 1]); flagvals.add(i + 1)
        if a == "--min-rows":
            min_rows = int(sys.argv[i + 1]); flagvals.add(i + 1)
        if a == "--waive":
            waived = set(sys.argv[i + 1].split(",")); flagvals.add(i + 1)
    args = [a for i, a in enumerate(sys.argv)
            if i > 0 and i not in flagvals and not a.startswith("--")]
    prev_q, prev_m = load(args[0])
    cur_q, cur_m = load(args[1])
    common = sorted(set(prev_m) & set(cur_m))
    only_prev = sorted(set(prev_q) - set(cur_q))
    only_cur = sorted(set(cur_q) - set(prev_q))
    bad = []
    for name in common:
        p_rows, _, p_spill = (list(prev_m[name]) + [0, 0, 0])[:3]
        c_rows, _, c_spill = (list(cur_m[name]) + [0, 0, 0])[:3]
        if c_rows > growth * max(p_rows, 1) and (
                p_rows >= 100 or c_rows >= min_rows):
            if name in waived:
                print(f"WAIVED {name}: shuffle rows {p_rows} -> {c_rows} "
                      f"({c_rows / max(p_rows, 1):.1f}x) — reviewed rework")
            else:
                bad.append(f"{name}: shuffle rows {p_rows} -> {c_rows} "
                           f"({c_rows / max(p_rows, 1):.1f}x > {growth}x)")
        if p_spill == 0 and c_spill > 0:
            bad.append(f"{name}: NEW spill {c_spill} bytes (was 0)")
    improved = [n for n in common
                if (list(prev_m[n]) + [0])[2] > 0
                and (list(cur_m[n]) + [0, 0, 0])[2] == 0]
    print(f"common surface: {len(common)} queries"
          f" | new: {len(only_cur)} | removed: {len(only_prev)}")
    if improved:
        print(f"spill eliminated on: {', '.join(improved)}")
    if only_cur:
        print(f"new (no baseline): {', '.join(only_cur)}")
    if only_prev:
        print(f"removed: {', '.join(only_prev)}")
    if bad:
        print(f"\n{len(bad)} PLAN REGRESSION(S):")
        for b in bad:
            print(f"  FAIL {b}")
        sys.exit(1)
    print("plan-metrics gate: CLEAN")


if __name__ == "__main__":
    main()
