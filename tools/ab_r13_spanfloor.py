"""Measure the q186/q114 span-prefilter crossover: one-pass string
window/aggregate vs the hot-hash prefiltered tier on synthetic
span-shaped corpora ABOVE the gate scales, where the dispatch floor
actually operates (VERDICT r12 item 2 — the q102-floor methodology).

    python tools/ab_r13_spanfloor.py 20 60 200     # sizes in THOUSANDS of docs

Why this exists: the r12 probe (tools/ab_r12_span.py) showed the
prefilter LOSES 1.7x at sf0.1 (shingle generation dominates, paid
twice), so the swap stayed a docstring.  Round 13 ships it as a
dispatched tier; this tool measures where the string-keyed exchange
overtakes the second generation pass and sets
``operators.text.SPAN_PREFILTER_MIN_DOC_ROWS`` from the crossover.

Protocol: bench.py's exact forcing (noop sink, scoped caches released,
catalog cache cleared), synthetic docs WRITTEN TO PARQUET once per
size (so both arms re-scan files exactly like the real query — an
in-plan text generator would bias the two-pass arm), one untimed warm
run per arm then arms alternated O/P/O/P within one JVM at each size,
medians reported, and the two tiers' full outputs equality-checked at
every size.  Data is deterministic (xxhash64 — no rand(), guide §2.5)
and fixture-shaped: ~470 tokens/doc in 10 blocks of 47, each block a
shared-pool boilerplate block with probability 1/10 (pool 1000), which
yields a hot-occurrence fraction near sf0.1's measured 9%.
"""

from __future__ import annotations

import gc
import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.plans import force_evaluate  # noqa: E402
from alpaca_pyspark_spark.queries.llm import (  # noqa: E402
    _q186_onepass,
    _q186_prefiltered,
)
from alpaca_pyspark_spark.queries.search import (  # noqa: E402
    _q114_aggregate,
    _q114_prefiltered_shingles,
    _q114_shingles,
)
from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.session import release_scoped_caches  # noqa: E402

REPS = 3  # timed reps per arm per size, alternated O/P/O/P after a warm
BLOCKS, BLOCK_LEN, POOL = 10, 47, 1000


def write_synth(spark, n_docs: int, path: str) -> None:
    """Deterministic fixture-shaped corpus: BLOCKS blocks of BLOCK_LEN
    tokens per doc; block j of doc d is boilerplate block
    pmod(xxhash64(d, j, 1), POOL) with probability 1/10, else unique
    tokens keyed by (d, i)."""
    t = BLOCKS * BLOCK_LEN
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))

    def tok(i):
        j = F.floor(i / BLOCK_LEN)
        boiler = F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(10)) == 0
        bid = F.pmod(F.xxhash64(F.col("doc_id"), j, F.lit(1)), F.lit(POOL))
        return F.when(
            boiler,
            F.concat(
                F.lit("b"),
                bid.cast("string"),
                F.lit("p"),
                F.pmod(i, F.lit(BLOCK_LEN)).cast("string"),
            ),
        ).otherwise(
            F.concat(
                F.lit("u"), F.hex(F.xxhash64(F.col("doc_id"), i))
            )
        )

    docs = d.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(t - 1)), tok), " "
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(path)


def run_forced(mk) -> float:
    df = mk()
    spark = df.sparkSession
    spark.catalog.clearCache()
    gc.collect()
    t0 = time.perf_counter()
    force_evaluate(df)
    dt = time.perf_counter() - t0
    release_scoped_caches()
    spark.catalog.clearCache()
    return dt


def rows_of(mk) -> list:
    df = mk()
    out = [tuple(r) for r in df.collect()]
    release_scoped_caches()
    df.sparkSession.catalog.clearCache()
    return out


def main() -> None:
    sizes_k = [int(a) for a in sys.argv[1:]] or [20, 60, 200]
    spark = get_spark("ab-r13-spanfloor")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="spanfloor_")
    out = {
        "protocol": "noop-sink forced, warm per arm then O/P alternated "
        f"in one JVM per size, {REPS} timed reps per arm, medians; "
        "deterministic xxhash64 synthetic corpus written to parquet "
        f"({BLOCKS}x{BLOCK_LEN} tokens/doc, boilerplate pool {POOL}, "
        "p=1/10), tier outputs equality-checked per size",
        "sizes": {},
    }
    for k in sizes_k:
        n = k * 1000
        path = f"{root}/docs_{k}k"
        write_synth(spark, n, path)
        docs = lambda: spark.read.parquet(path)  # noqa: E731
        size_out = {"n_docs": n}
        cases = {
            "q186": (
                lambda: _q186_onepass(docs()),
                lambda: _q186_prefiltered(docs()),
            ),
            "q114": (
                lambda: _q114_aggregate(_q114_shingles(docs())),
                lambda: _q114_aggregate(_q114_prefiltered_shingles(docs())),
            ),
        }
        for q, (one, pre) in cases.items():
            spark.sparkContext.setJobDescription(f"spanfloor {k}k {q} warm")
            run_forced(one)
            run_forced(pre)
            to, tp = [], []
            for rep in range(REPS):
                spark.sparkContext.setJobDescription(f"spanfloor {k}k {q} O")
                to.append(round(run_forced(one), 2))
                spark.sparkContext.setJobDescription(f"spanfloor {k}k {q} P")
                tp.append(round(run_forced(pre), 2))
                print(
                    f"# {k}k {q} rep{rep}: onepass {to[-1]}s "
                    f"prefiltered {tp[-1]}s",
                    file=sys.stderr,
                    flush=True,
                )
            spark.sparkContext.setJobDescription(f"spanfloor {k}k {q} parity")
            parity = sorted(rows_of(one)) == sorted(rows_of(pre))
            print(f"# {k}k {q} parity={parity}", file=sys.stderr, flush=True)
            size_out[q] = {
                "onepass_s": to,
                "prefiltered_s": tp,
                "onepass_median": round(statistics.median(to), 2),
                "prefiltered_median": round(statistics.median(tp), 2),
                "parity": parity,
            }
        out["sizes"][f"{k}k"] = size_out
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
