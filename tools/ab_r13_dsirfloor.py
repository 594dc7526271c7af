"""Measure the DSIR pair-aggregate recompute-vs-persist crossover
(VERDICT r12 "what's wrong" item 2): q187's scored stage with
``_dsir_raw_lm(persist_pairs=False)`` (recompute the pair agg for the
``n_bigram_types`` scalar — r12's fixed choice, won at sf0.1) vs
``persist_pairs=True`` (scoped persist of the vocab-bounded pair
table), on synthetic fixture-shaped corpora above the gate scales.
Sets ``queries.llm.DSIR_PERSIST_MIN_DOC_ROWS`` from the crossover.

    python tools/ab_r13_dsirfloor.py 20 60 200   # THOUSANDS of docs

Protocol: bench.py forcing, warm per arm then arms alternated R/P/R/P
in one JVM per size, medians of REPS, outputs equality-checked per
size; corpora parquet-staged so both arms re-scan files.

Corpus shape matters here, deliberately: the floor exists for the
regime where the bigram VOCABULARY saturates (Heaps' law — pair types
grow sublinearly while transitions grow linearly), because that is
when the persisted pair table is small relative to the transition
re-aggregation it saves.  The generator therefore draws every token
from a FIXED 1,000-token vocabulary (deterministic xxhash64), so pair
types cap at ~1M while transitions scale with the corpus — the
saturated regime.  On fixture-shaped near-unique-bigram corpora
(pair types ~= transitions) recompute wins at every size by
construction (the r12 A/B's regime); the floor targets the saturating
regime a real 100 TB corpus is in.
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.functions import tokens  # noqa: E402
from alpaca_pyspark_spark.plans import force_evaluate  # noqa: E402
from alpaca_pyspark_spark.queries.llm import _dsir_raw_lm  # noqa: E402
from alpaca_pyspark_spark.session import (  # noqa: E402
    get_spark,
    release_scoped_caches,
    scoped_persist,
)

REPS = 3
VOCAB = 1000
TOKS_PER_DOC = 470


def write_synth(spark, n_docs: int, path: str) -> None:
    """Vocabulary-saturating corpus: TOKS_PER_DOC tokens per doc, every
    token uniform over a VOCAB-word closed vocabulary."""
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(TOKS_PER_DOC - 1)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id"), i), F.lit(VOCAB)
                    ).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(path)


def scored(docs, persist_pairs: bool):
    """q187's scored stage verbatim (every doc 'en' so tgt_lm is the
    full LM — the arm difference is only inside _dsir_raw_lm)."""
    t = tokens(F.col("text"))
    n = F.size(t)
    trans = (
        docs.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, n - 1).alias("w1"),
                    F.slice(t, 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .transform(scoped_persist)
    )
    raw_lm = _dsir_raw_lm(trans, persist_pairs=persist_pairs)
    tgt_lm = (
        trans.filter(F.col("doc_id") % 3 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_t"))
        .withColumn("first_t", F.sum("pair_t").over(Window.partitionBy("w1")))
    )
    return (
        trans.join(F.broadcast(raw_lm), ["w1", "w2"])
        .join(F.broadcast(tgt_lm), ["w1", "w2"], "left")
        .select(
            "doc_id",
            F.expr(
                "(1000000 * (coalesce(pair_t, 0) + 1) * first_r)"
                " DIV ((coalesce(first_t, 0) + n_bigram_types) * pair_r)"
            ).alias("ratio_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.sum("ratio_micro").alias("sum_ratio"),
        )
        .select("doc_id", F.expr("sum_ratio DIV n_trans").alias("wgt"))
    )


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
    out = sorted(tuple(r) for r in df.collect())
    release_scoped_caches()
    df.sparkSession.catalog.clearCache()
    return out


def main() -> None:
    sizes_k = [int(a) for a in sys.argv[1:]] or [20, 60, 200]
    spark = get_spark("ab-r13-dsirfloor")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dsirfloor_")
    out = {
        "protocol": "noop-sink forced, warm per arm then R/P alternated "
        f"in one JVM per size, {REPS} reps, medians, parity-checked; "
        f"vocabulary-saturating synthetic corpus (closed {VOCAB}-word "
        f"vocab, {TOKS_PER_DOC} tokens/doc, parquet-staged)",
        "sizes": {},
    }
    for k in sizes_k:
        path = f"{root}/docs_{k}k"
        write_synth(spark, k * 1000, path)
        docs = lambda: spark.read.parquet(path)  # noqa: E731
        mks = {
            "recompute": lambda: scored(docs(), False),
            "persist": lambda: scored(docs(), True),
        }
        for nm, mk in mks.items():
            spark.sparkContext.setJobDescription(f"dsirfloor {k}k {nm} warm")
            run_forced(mk)
        t = {nm: [] for nm in mks}
        for rep in range(REPS):
            for nm, mk in mks.items():
                spark.sparkContext.setJobDescription(f"dsirfloor {k}k {nm}")
                t[nm].append(round(run_forced(mk), 2))
            print(
                f"# {k}k rep{rep}: recompute {t['recompute'][-1]}s "
                f"persist {t['persist'][-1]}s",
                file=sys.stderr,
                flush=True,
            )
        spark.sparkContext.setJobDescription(f"dsirfloor {k}k parity")
        parity = rows_of(mks["recompute"]) == rows_of(mks["persist"])
        print(f"# {k}k parity={parity}", file=sys.stderr, flush=True)
        out["sizes"][f"{k}k"] = {
            "recompute_s": t["recompute"],
            "persist_s": t["persist"],
            "recompute_median": round(statistics.median(t["recompute"]), 2),
            "persist_median": round(statistics.median(t["persist"]), 2),
            "parity": parity,
        }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
