"""Pin the executed-streaming cost budget (VERDICT r12 item 7): one
measured table of what the micro-batch MACHINERY costs — staging
writes, stream start/drain, state-store and watermark bookkeeping —
independent of any query's own logic, so future rounds stop
re-adjudicating the same ~40 s block.

Method: for each source class the 14-query block uses (events,
documents, trades+quotes pair), time

  * ``stage``     — the staging parquet write alone (every gate pays it),
  * ``identity``  — run_streaming_gate with the IDENTITY transform and
                    no sentinel (one drain: pure engine overhead),
  * ``identity2`` — identity WITH the sentinel two-drain protocol
                    (what watermark/append queries pay),

each with bench.py's forcing discipline, REPS reps, medians.  A
query's bench seconds minus its class's machinery floor is the upper
bound on what optimization could ever recover WITHOUT weakening what
the query proves (fewer batches / skipped sink round-trip = less
coverage, r11+r12 adjudications).

    python tools/streaming_breakdown_r13.py /root/testdata/sf0.1
"""

from __future__ import annotations

import gc
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

import shutil  # noqa: E402
import tempfile  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.session import release_scoped_caches  # noqa: E402
from alpaca_pyspark_spark.streaming.gate import (  # noqa: E402
    run_streaming_gate,
    sentinel_row,
)
from alpaca_pyspark_spark.tables import load, load_texts  # noqa: E402

REPS = 3


def timed(fn) -> float:
    gc.collect()
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    release_scoped_caches()
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("streaming-breakdown-r13")
    spark.sparkContext.setLogLevel("ERROR")

    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    docs = load_texts(spark, sf_dir).select("doc_id", "lang", "text")

    def stage_only(df):
        def run():
            d = tempfile.mkdtemp(prefix="sbrk_")
            try:
                df.write.mode("overwrite").parquet(d)
            finally:
                shutil.rmtree(d, ignore_errors=True)

        return run

    def identity_gate(df, sent):
        def run():
            out = run_streaming_gate(
                spark, [(df, sent)], lambda s: s, prefix="sbrk"
            )
            out.count()

        return run

    ev_sent = sentinel_row(
        spark,
        sf_dir,
        lambda ts: (-1, ts, -1, 0.0),
        "event_id long, ts timestamp_ntz, user_id long, value double",
    )

    cases = {
        "events_stage": stage_only(events),
        "events_identity": identity_gate(events, None),
        "events_identity_2drain": identity_gate(events, ev_sent),
        "documents_stage": stage_only(docs),
        "documents_identity": identity_gate(docs, None),
    }
    out = {"sf_dir": sf_dir, "reps": REPS, "cases": {}}
    for name, fn in cases.items():
        spark.sparkContext.setJobDescription(f"sbrk {name} warm")
        timed(fn)
        ts = []
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"sbrk {name}")
            ts.append(round(timed(fn), 2))
            print(f"# {name} rep{rep}: {ts[-1]}s", file=sys.stderr, flush=True)
        out["cases"][name] = {"s": ts, "median": round(statistics.median(ts), 2)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
