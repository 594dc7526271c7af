"""A/B probe (round 12): hot-hash prefilter for the span-overlap
family (guide §3.2 — reduce the big side before shuffling it).

q186: the global first-occurrence window shuffles EVERY span
occurrence (string payload).  Only spans occurring >1 times can
produce duplicates (4.7% of types / 9.1% of occurrences at sf0.1);
a map-side-combined count over xxhash64(span) finds the hot hashes,
which attach back as a broadcast semi-filter so the exact window
runs on candidates only.  Collisions only ADD candidates (the exact
window re-checks on the true string), so the result is unchanged.

q114: same idea for the >=3-docs passage aggregate: count pass over
(doc-distinct) hashed shingles, broadcast the hot set, exact
string aggregate on survivors only.

Alternated in one JVM; medians reported.
Run: python tools/ab_r12_span.py /root/testdata/sf0.1 [N]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.functions import tokens, word_shingles  # noqa: E402
from alpaca_pyspark_spark.plans import force_evaluate  # noqa: E402
from alpaca_pyspark_spark.queries import QUERIES  # noqa: E402
from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.session import release_scoped_caches  # noqa: E402
from alpaca_pyspark_spark.tables import load  # noqa: E402


def q186_prefilter(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    t = tokens(F.lower(F.col("text")))
    toks = docs.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        word_shingles(t, 8).alias("spans"),
    )
    occ = toks.select("doc_id", F.posexplode("spans").alias("pos", "span"))
    hot = (
        occ.select(F.xxhash64("span").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h")
    )
    cand = occ.join(
        F.broadcast(hot), F.xxhash64(F.col("span")) == F.col("h"), "inner"
    ).select("doc_id", "pos", "span")
    w = Window.partitionBy("span").orderBy("doc_id", "pos")
    dup_occ = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") > 1
    )
    dropped = (
        dup_occ.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(7))
            ).alias("tok_idx"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return (
        toks.select("doc_id", "n_tokens")
        .join(dropped, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dropped", F.lit(0))
            .cast("bigint")
            .alias("n_tokens_dropped"),
            (F.col("n_tokens") - F.coalesce("n_dropped", F.lit(0)))
            .cast("bigint")
            .alias("n_tokens_kept"),
        )
    )


def q114_prefilter(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.lower(F.col("text"))), 8))
        ).alias("passage"),
    )
    hot = (
        sh.select(F.xxhash64("passage").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
        .select("h")
    )
    cand = sh.join(
        F.broadcast(hot), F.xxhash64(F.col("passage")) == F.col("h"), "inner"
    ).select("doc_id", "passage")
    return (
        cand.groupBy("passage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("doc_ids"),
        )
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.col("n_docs").desc(), "passage")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-r12-span")
    spark.sparkContext.setLogLevel("ERROR")
    cases = {
        "q186_cur": lambda: QUERIES["q186_span_dedup_rewrite"](spark, sf_dir),
        "q186_pre": lambda: q186_prefilter(spark, sf_dir),
        "q114_cur": lambda: QUERIES["q114_repeated_passages"](spark, sf_dir),
        "q114_pre": lambda: q114_prefilter(spark, sf_dir),
    }
    times: dict[str, list[float]] = {k: [] for k in cases}
    rows: dict[str, int] = {}
    for name, mk in cases.items():  # warm
        rows[name] = force_evaluate(mk())
        release_scoped_caches()
        spark.catalog.clearCache()
    for r in range(rounds):
        for name, mk in cases.items():
            spark.catalog.clearCache()
            import gc

            gc.collect()
            t0 = time.perf_counter()
            n = force_evaluate(mk())
            dt = time.perf_counter() - t0
            release_scoped_caches()
            spark.catalog.clearCache()
            times[name].append(dt)
            print(f"# r{r} {name}: {n} rows {dt:.3f}s", flush=True)
    print("rows:", rows)
    for name, ts in times.items():
        print(
            f"{name}: median={statistics.median(ts):.3f}s "
            f"all={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
