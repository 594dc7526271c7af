"""A/B probe (round 12): row-local vs explode/groupBy shapes in the
curation family (q183/q189) — guide §2.4 "remove shuffles outright".

Candidate rewrites, all semantics-identical (the streaming twins q190/
q191 already compute these row-locally and hash-match the same
oracles):

  A. top-2-gram count: explode(g2) -> groupBy(doc_id,g) -> groupBy(doc_id)
     vs the row-local sorted-run fold (_rowlocal_top2).
  B. stop-word doc-frequency: tok.distinct() -> groupBy(token)
     vs explode(array_distinct(t)) -> groupBy(token)  (distinct folded
     into the row, removing the corpus-wide DISTINCT exchange).
  C. per-doc stop-type count: broadcast-join + groupBy(doc_id)
     vs row-local array_intersect against the broadcast stop array.

Run AFTER the bench finishes (one JVM, warm+timed protocol per case).

    python tools/ab_r12_curation.py /root/testdata/sf0.1
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.functions import tokens, word_shingles  # noqa: E402
from alpaca_pyspark_spark.plans import force_evaluate  # noqa: E402
from alpaca_pyspark_spark.queries.llm import _rowlocal_top2  # noqa: E402
from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.tables import load_texts  # noqa: E402


def timeit(label, mk):
    # warm then timed, same as bench.py
    force_evaluate(mk())
    t0 = time.perf_counter()
    n = force_evaluate(mk())
    dt = time.perf_counter() - t0
    print(f"{label}: {n} rows in {dt:.3f}s", flush=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-r12-curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_texts(spark, sf_dir)
    t = tokens(F.col("text"))

    # ---- A: top-2-gram count ----------------------------------------
    def top2_explode():
        base = docs.select("doc_id", word_shingles(t, 2).alias("g2"))
        return (
            base.select("doc_id", F.explode("g2").alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(F.max("c").alias("top2"))
        )

    def top2_rowlocal():
        base = docs.select("doc_id", word_shingles(t, 2).alias("g2"))
        return base.select("doc_id", _rowlocal_top2(F.col("g2")).alias("top2"))

    timeit("A1 top2 explode+2agg", top2_explode)
    timeit("A2 top2 row-local   ", top2_rowlocal)

    # equivalence spot-check (exact antijoin both ways)
    a = top2_explode().withColumnRenamed("top2", "x")
    b = top2_rowlocal().withColumnRenamed("top2", "y")
    # explode path drops zero-bigram docs; align on left join semantics
    diff = (
        b.join(a, "doc_id", "left")
        .filter(F.coalesce(F.col("x"), F.lit(0)) != F.col("y"))
        .count()
    )
    print(f"A equivalence: {diff} mismatched docs (MUST be 0)")

    # ---- B: stop-token document frequency ----------------------------
    def stop_distinct():
        tok = docs.select("doc_id", F.explode(t).alias("token"))
        return (
            tok.distinct()
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .orderBy(F.col("df").desc(), "token")
            .limit(20)
        )

    def stop_rowlocal():
        tok = docs.select(
            "doc_id", F.explode(F.array_distinct(t)).alias("token")
        )
        return (
            tok.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .orderBy(F.col("df").desc(), "token")
            .limit(20)
        )

    timeit("B1 stop df distinct+agg", stop_distinct)
    timeit("B2 stop df row-distinct", stop_rowlocal)
    x = [tuple(r) for r in stop_distinct().collect()]
    y = [tuple(r) for r in stop_rowlocal().collect()]
    print(f"B equivalence: {'OK' if x == y else 'MISMATCH'}")

    # ---- C: per-doc stop-type count ----------------------------------
    def stopk_join():
        stop = stop_rowlocal()
        tok = docs.select("doc_id", F.explode(t).alias("token"))
        return (
            tok.join(F.broadcast(stop.select("token")), "token")
            .groupBy("doc_id")
            .agg(F.countDistinct("token").alias("stop_types"))
        )

    def stopk_rowlocal():
        stop_arr = stop_rowlocal().agg(
            F.collect_list("token").alias("__stops")
        ).withColumn("__k", F.lit(1))
        return (
            docs.select("doc_id", F.array_distinct(t).alias("td"))
            .withColumn("__k", F.lit(1))
            .join(F.broadcast(stop_arr), "__k")
            .select(
                "doc_id",
                F.size(F.array_intersect("td", "__stops")).alias("stop_types"),
            )
            .filter(F.col("stop_types") > 0)
        )

    timeit("C1 stopk join+agg   ", stopk_join)
    timeit("C2 stopk row-local  ", stopk_rowlocal)
    a = stopk_join().withColumnRenamed("stop_types", "x")
    b = stopk_rowlocal().withColumnRenamed("stop_types", "y")
    diff = (
        a.join(b, "doc_id", "full")
        .filter(
            F.coalesce(F.col("x"), F.lit(0)) != F.coalesce(F.col("y"), F.lit(0))
        )
        .count()
    )
    print(f"C equivalence: {diff} mismatched docs (MUST be 0)")


if __name__ == "__main__":
    main()
