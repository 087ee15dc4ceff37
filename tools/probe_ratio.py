#!/usr/bin/env python3
"""Per-query and per-family time ratios between two Bench JSON lines
(e.g. a 100x probe vs BENCH_LOCAL.json at sf0.1) — the table the
BASELINE.md scaling sections are written from.

Usage: probe_ratio.py <baseline.json> <scaled.json> [row_ratio]
Prints family totals with ratios, then the worst per-query ratios.
Queries missing from either side are skipped (listed at the end)."""
import json
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))["queries"]
    cur = json.load(open(sys.argv[2]))["queries"]
    row_ratio = sys.argv[3] if len(sys.argv) > 3 else "?"
    common = sorted(set(base) & set(cur))
    skipped = sorted(set(base) ^ set(cur))
    if not common:
        print("no common queries between the two bench files")
        sys.exit(2)
    fams = {}
    for q in common:
        fams.setdefault(q.split("_")[0], []).append(q)
    bt = sum(base[q] for q in common)
    ct = sum(cur[q] for q in common)
    print(f"common {len(common)} queries | total {bt:.1f} -> {ct:.1f} s "
          f"= {ct / bt:.1f}x time for {row_ratio}x rows")
    print(f"{'family':>8} {'n':>3} {'base_s':>8} {'cur_s':>8} {'ratio':>6}")
    for f in sorted(fams, key=lambda f: -sum(cur[q] for q in fams[f])):
        fb = sum(base[q] for q in fams[f])
        fc = sum(cur[q] for q in fams[f])
        print(f"{f:>8} {len(fams[f]):>3} {fb:>8.1f} {fc:>8.1f} "
              f"{fc / max(fb, 1e-9):>5.1f}x")
    rows = sorted(common, key=lambda q: -cur[q] / max(base[q], 1e-9))
    print("\nworst per-query ratios:")
    for q in rows[:15]:
        print(f"  {cur[q] / max(base[q], 1e-9):>6.1f}x "
              f"{base[q]:>7.2f} -> {cur[q]:>8.2f} s  {q}")
    print("\nbiggest absolute (scaled):")
    for q in sorted(common, key=lambda q: -cur[q])[:15]:
        print(f"  {cur[q]:>8.2f} s ({cur[q] / max(base[q], 1e-9):>5.1f}x)  {q}")
    if skipped:
        print(f"\nskipped (one side only): {', '.join(skipped)}")


if __name__ == "__main__":
    main()
