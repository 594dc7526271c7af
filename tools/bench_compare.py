"""Compare two BENCH_DETAIL.json files: medians, subtotals, outliers.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_floor]
           [--json OUT.json]

Single-JVM per-query timings wobble 2-3x run to run (SCALE.md
"Measurement notes"); the stable signals this prints are the shared-id
median ratio and subtotal deltas.  Outliers above ratio_floor (default
2.0) are listed for eyeballing, not alarm.  With ``--json`` the same
comparison is written as a machine-readable round artifact
(BENCH_COMPARE_r{N}.json) so regressions are self-reported.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: bench_compare.py OLD.json NEW.json "
                     "[ratio_floor] [--json OUT.json]")
        json_out = args[i + 1]
        del args[i : i + 2]
    old = json.load(open(args[0]))["queries"]
    new = json.load(open(args[1]))["queries"]
    floor = float(args[2]) if len(args) > 2 else 2.0
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
    if json_out:
        payload = {
            "old": args[0],
            "new": args[1],
            "n_shared": len(shared),
            "only_old": sorted(set(old) - set(new)),
            "only_new": sorted(set(new) - set(old)),
            "shared_subtotal_old_sec": round(sum(old[k] for k in shared), 3),
            "shared_subtotal_new_sec": round(sum(new[k] for k in shared), 3),
            "median_ratio": round(statistics.median(ratios.values()), 3),
            "ratio_floor": floor,
            "outliers": {
                k: {"old": old[k], "new": new[k], "ratio": round(r, 3)}
                for r, k in sorted(out, reverse=True)
            },
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
