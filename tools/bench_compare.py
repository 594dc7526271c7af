"""Compare two BENCH_DETAIL.json files: medians, subtotals, outliers —
plus an interleaved A/B mode that settles flagged outliers with paired
measurements instead of cross-day prose.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_floor]
           [--json OUT.json]
       python tools/bench_compare.py --ab QID [QID...] [--old REF]
           [--rounds N] [--reps K] [--sf-dir DIR] [--json OUT.json]

Single-JVM per-query timings wobble 2-3x run to run and the HOST
drifts across a day (same-code whole-bench totals spread 169-210 s in
round 5), so a cross-day BENCH_DETAIL ratio for one query proves
nothing by itself.  ``--ab`` removes the ambiguity: it checks out
``REF`` (default: the previous round's artifact commit) into a scratch
worktree under .scratch/, then ALTERNATES old/new probe processes
within one host session (``tools/_ab_probe.py``, bench.py's
steady-state protocol, K timed reps each) and reports per-query paired
ratios — host drift hits both sides of each pair equally and cancels.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DEFAULT_OLD_REF = "6247416"  # round-4 artifact commit (BENCH_r04 code state)


def _probe(repo_dir: str, qid: str, sf_dir: str, reps: int) -> list[float]:
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "_ab_probe.py"),
         repo_dir, qid, sf_dir, str(reps)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["times"]


def run_ab(qids: list[str], old_ref: str, rounds: int, reps: int,
           sf_dir: str, json_out: str | None) -> None:
    scratch = REPO / ".scratch" / f"ab_{old_ref}"
    if not scratch.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(scratch), old_ref],
            cwd=REPO, check=True,
        )
    results = {}
    for qid in qids:
        pairs = []
        for i in range(rounds):
            # alternate which side goes first so slow-drift within the
            # session doesn't systematically favor one side
            order = [("old", str(scratch)), ("new", str(REPO))]
            if i % 2:
                order.reverse()
            sample = {}
            for side, repo_dir in order:
                sample[side] = _probe(repo_dir, qid, sf_dir, reps)
            pairs.append(sample)
            print(f"  {qid} round {i+1}/{rounds}: "
                  f"old={sample['old']} new={sample['new']}", file=sys.stderr)
        med_old = statistics.median(t for p in pairs for t in p["old"])
        med_new = statistics.median(t for p in pairs for t in p["new"])
        min_old = min(t for p in pairs for t in p["old"])
        min_new = min(t for p in pairs for t in p["new"])
        paired_ratios = [
            statistics.median(p["new"]) / statistics.median(p["old"])
            for p in pairs
        ]
        results[qid] = {
            "old_ref": old_ref,
            "rounds": rounds,
            "reps_per_process": reps,
            "samples": pairs,
            "median_old_sec": round(med_old, 4),
            "median_new_sec": round(med_new, 4),
            "min_old_sec": round(min_old, 4),
            "min_new_sec": round(min_new, 4),
            "paired_ratios": [round(r, 3) for r in paired_ratios],
            "median_paired_ratio": round(statistics.median(paired_ratios), 3),
        }
        print(f"{qid}: median {med_old:.3f}s -> {med_new:.3f}s  "
              f"(min {min_old:.3f} -> {min_new:.3f})  "
              f"median paired ratio {results[qid]['median_paired_ratio']}x")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out}")


def main() -> None:
    args = list(sys.argv[1:])
    json_out = None
    if "--ab" in args:
        args.remove("--ab")

        def _opt(name, default, cast=str):
            if name in args:
                i = args.index(name)
                v = cast(args[i + 1])
                del args[i : i + 2]
                return v
            return default

        old_ref = _opt("--old", DEFAULT_OLD_REF)
        rounds = _opt("--rounds", 3, int)
        reps = _opt("--reps", 3, int)
        sf_dir = _opt("--sf-dir", "/root/testdata/sf0.1")
        json_out = _opt("--json", None)
        if not args:
            sys.exit("usage: bench_compare.py --ab QID [QID...] "
                     "[--old REF] [--rounds N] [--reps K] [--sf-dir DIR] "
                     "[--json OUT.json]")
        run_ab(args, old_ref, rounds, reps, sf_dir, json_out)
        return
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
