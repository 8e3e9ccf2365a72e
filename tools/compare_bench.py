#!/usr/bin/env python3
"""Dev-only bench diff: per-query ratio report between two graft.Bench
JSON files (NOT part of the engine). Separates real regressions from
uniform ambient load: if the median ratio is ~1.1, the box was busy; a
query at 3x against a 1.1 median is a real finding.

Usage: python3 tools/compare_bench.py <old.json> <new.json> [threshold]
Prints queries whose new/old ratio exceeds threshold (default 1.5) after
dividing out the median ratio, plus added/removed queries and totals.
"""
import json
import statistics
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    if not common:
        print("no common queries")
        return
    ratios = {k: nq[k] / max(oq[k], 1e-9) for k in common}
    med = statistics.median(ratios.values())
    print(f"total: {old.get('value'):.1f}s -> {new.get('value'):.1f}s  "
          f"({len(oq)} -> {len(nq)} queries, median per-query ratio {med:.2f})")
    flagged = [(k, r) for k, r in ratios.items()
               # divide out ambient load; ignore sub-0.3s noise floor
               if r / med > threshold and nq[k] > 0.3]
    for k, r in sorted(flagged, key=lambda kv: -kv[1]):
        print(f"  REGRESSED {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s "
              f"(x{r:.2f}, x{r / med:.2f} load-adjusted)")
    improved = [(k, r) for k, r in ratios.items()
                if med / max(r, 1e-9) > threshold and oq[k] > 0.3]
    for k, r in sorted(improved, key=lambda kv: kv[1]):
        print(f"  improved  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s (x{r:.2f})")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    failed = sorted(new.get("failed", []))
    if failed:
        # zero-success queries carry no timing at all since round 12 —
        # surface them as RED, never as absent-and-therefore-fine
        print("  FAILED (red, no timing):", ", ".join(failed))
    if added:
        print("  added:", ", ".join(added))
    if removed:
        print("  removed:", ", ".join(removed))
    if not flagged:
        print("  no load-adjusted regressions above "
              f"x{threshold} (median divided out)")


if __name__ == "__main__":
    main()
