"""Round-13 interleaved idle-host A/B: the curation cluster, r11 code
vs HEAD (VERDICT r12 item 1).

The r12 close showed q191 0.74x / q187 0.80x / q189 0.84x vs the r11
close on CROSS-HOST single bench readings; the r12 builder's fresh-JVM
medians said flat.  This tool settles it: the SAME host, the SAME hour,
arms alternated in time (A B A B ...), one fresh JVM per (arm, rep)
running bench.py's exact warm+timed+noop-sink protocol
(tools/retime_some.py) over the six cluster queries.  Medians decide.

Arms:
  A = r11 close (git worktree at f2027f9, retime_some.py copied in)
  B = HEAD (this repo)

Run:  python tools/ab_r13_curation.py [REPS]   (default 5)
Writes AB_r13_curation.json.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

QIDS = [
    "q187_dsir_importance",
    "q189_curation_pipeline",
    "q190_streaming_quality_filter",
    "q191_streaming_curation",
    "q192_hybrid_retrieval",
    "q197_corpus_build",
]
SF_DIR = "/root/testdata/sf0.1"
ARMS = {"r11": "/tmp/r11tree", "head": str(Path(__file__).resolve().parent.parent)}


def run_arm(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, f"{tree}/tools/retime_some.py", SF_DIR, *QIDS],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    raw: dict[str, list[dict]] = {a: [] for a in ARMS}
    for rep in range(reps):
        for arm, tree in ARMS.items():
            r = run_arm(tree)
            raw[arm].append(r)
            print(
                f"# rep{rep} {arm}: "
                + " ".join(f"{q.split('_')[0]}={r[q]['timed']}" for q in QIDS),
                file=sys.stderr,
                flush=True,
            )
    summary = {}
    for q in QIDS:
        a = [r[q]["timed"] for r in raw["r11"]]
        b = [r[q]["timed"] for r in raw["head"]]
        ma, mb = statistics.median(a), statistics.median(b)
        summary[q] = {
            "r11_s": a,
            "head_s": b,
            "r11_median": round(ma, 3),
            "head_median": round(mb, 3),
            "head_over_r11": round(mb / ma, 3) if ma else None,
            "rows_r11": raw["r11"][0][q]["rows"],
            "rows_head": raw["head"][0][q]["rows"],
        }
    out = {
        "protocol": "fresh JVM per (arm, rep), arms alternated in time, "
        "bench.py warm+timed+noop-sink per query (retime_some.py), "
        f"{reps} reps, medians; r11 arm = worktree at f2027f9",
        "summary": summary,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
