"""Run the FULL five-gate correctness matrix in one command:

  fixtures   driver sf0.01                       -> ORACLE_LOCAL_r{N}.json
  10x probe  driver sf0.1                        -> ORACLE_SF01_r{N}.json
  zero-row   tools/make_empty.py                 -> ORACLE_EMPTY_r{N}.json
  replica    tools/make_sf1.py --src sf0.001     -> ORACLE_REPLICA_r{N}.json
  null       tools/make_nullstress.py            -> ORACLE_NULLS_r{N}.json

Builds any missing stress dataset first, then runs tools/driver_mimic.py
on each.  Exit 0 iff every gate is ALL MATCH.  The 10x probe is the
slow one (~45 min); --skip-sf01 drops it for a fast (~40 min total)
four-gate sweep.

Usage: python tools/run_gates.py --round 9 [--skip-sf01]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def sh(*args: str) -> int:
    print("::", " ".join(args), flush=True)
    return subprocess.run(list(args), cwd=REPO).returncode


def ensure(dataset: Path, builder: list[str]) -> None:
    if not dataset.exists():
        rc = sh(sys.executable, *builder)
        if rc:
            raise SystemExit(f"builder failed: {builder}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip-sf01", action="store_true")
    args = ap.parse_args()
    n = args.round
    scratch = REPO / ".scratch"
    ensure(scratch / "empty", ["tools/make_empty.py"])
    ensure(
        scratch / "rep0.01",
        [
            "tools/make_sf1.py",
            "--src",
            "/root/testdata/sf0.001",
            "--dest",
            str(scratch / "rep0.01"),
        ],
    )
    ensure(scratch / "nulls", ["tools/make_nullstress.py"])
    gates = [
        ("/root/testdata/sf0.01", f"ORACLE_LOCAL_r{n}.json"),
        (str(scratch / "empty"), f"ORACLE_EMPTY_r{n}.json"),
        (str(scratch / "rep0.01"), f"ORACLE_REPLICA_r{n}.json"),
        (str(scratch / "nulls"), f"ORACLE_NULLS_r{n}.json"),
    ]
    if not args.skip_sf01:
        gates.insert(1, ("/root/testdata/sf0.1", f"ORACLE_SF01_r{n}.json"))
    failed = []
    for sf_dir, out in gates:
        rc = sh(sys.executable, "tools/driver_mimic.py", sf_dir, "--out", out)
        if rc:
            failed.append(out)
    if failed:
        raise SystemExit(f"gates FAILED: {failed}")
    print(f"all {len(gates)} gates green")


if __name__ == "__main__":
    main()
