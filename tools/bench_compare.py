"""Compare two BENCH_DETAIL.json files: medians, subtotals, outliers.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_floor]

Single-JVM per-query timings wobble 2-3x run to run (SCALE.md
"Measurement notes"); the stable signals this prints are the shared-id
median ratio and subtotal deltas.  Outliers above ratio_floor (default
2.0) are listed for eyeballing, not alarm.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    shared = sorted(set(old) & set(new))
    ratios = {k: new[k] / old[k] for k in shared if old[k] > 0.05}
    print(
        f"shared={len(shared)}  only-old={len(set(old) - set(new))}"
        f"  only-new={len(set(new) - set(old))}"
    )
    print(
        f"shared subtotal: {sum(old[k] for k in shared):.1f}s ->"
        f" {sum(new[k] for k in shared):.1f}s"
        f"   median ratio: {statistics.median(ratios.values()):.2f}x"
    )
    out = [(r, k) for k, r in ratios.items() if r >= floor]
    for r, k in sorted(out, reverse=True):
        print(f"  {r:5.2f}x  {old[k]:7.3f} -> {new[k]:7.3f}  {k}")
    if not out:
        print(f"  (no shared query >= {floor}x slower)")


if __name__ == "__main__":
    main()
