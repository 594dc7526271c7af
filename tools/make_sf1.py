"""Build an sf1-scale stress dataset by replicating sf0.1 ten times
with key-shifted, perturbation-tagged replicas (driver testdata stops
at sf0.1; VERDICT round-4 item 3 asks for one decade of measured
scale-up on the scale-claimed operator families).

NOT an oracle input — correctness stays pinned to the driver-generated
parquet.  This dataset exists purely to measure how the engine's
wall-times and shuffle volumes move across a 10x row-count decade.

Replication is shape-preserving, not copy-paste:

* every key column shifts by ``replica * (max_key + 1)`` so joins keep
  referential integrity and key cardinality scales with the data
  (10 identical key spaces would turn every equi-join into a 10-way
  hot-key skew the real generator doesn't have);
* ``documents.text`` gets a per-replica nonce TOKEN prepended so the
  near-dup families (shingle MinHash/SimHash/containment) see 10x
  corpus, not 10 exact copies of each doc (which would inflate every
  LSH bucket 10x and measure a pathology, not scale);
* ``embeddings.embedding`` gets a tiny deterministic per-replica
  rotation (component 0 scaled by 1 + replica/1000) for the same
  reason in cosine space;
* timestamps are left as-is: 10x event density in the same window is
  exactly what a 10x-bigger day of the same feed looks like.

Usage: python tools/make_sf1.py [--dest /root/repo/.scratch/sf1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from alpaca_pyspark_spark.session import get_spark
from alpaca_pyspark_spark.tables import load

SRC = "/root/testdata/sf0.1"  # default; --src overrides (chainable)
REPLICAS = 10

#: key DOMAINS: every (table, column) drawing from the same key space
#: shares ONE shift span = max over ALL of the domain's columns + 1.
#: Computing the span per column instead would silently break
#: referential integrity whenever a parent max-key row has no child
#: reference (spans diverge and each replica's FKs point past/below
#: the replica's PKs) — so parent key and every foreign reference move
#: by the same constant, unconditionally.
#: nation/region FKs never shift (those dimensions are static).
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
#: replicated fact/entity tables (derived from the domains).
SCALED = sorted({t for cols in KEY_DOMAINS.values() for t, _ in cols})
#: dimension tables copied once, unscaled (as in TPC-H).
STATIC = ["region", "nation"]


def domain_spans(spark, src: str) -> dict[tuple[str, str], int]:
    """(table, column) -> shift span, one shared span per key domain."""
    spans: dict[tuple[str, str], int] = {}
    for cols in KEY_DOMAINS.values():
        m = max(
            load(spark, src, t).agg(F.max(c)).collect()[0][0] for t, c in cols
        )
        for t, c in cols:
            spans[(t, c)] = m + 1
    return spans


def scale_table(
    spark,
    name: str,
    src: str,
    dest: str,
    spans: dict[tuple[str, str], int],
    replicas: int,
    nonce_tag: str,
) -> int:
    df = load(spark, src, name)
    shifts = {c: s for (t, c), s in spans.items() if t == name}
    parts = []
    for r in range(replicas):
        rep = df
        for c, span in shifts.items():
            rep = rep.withColumn(c, F.col(c) + F.lit(r * span))
        if name == "documents":
            # nonce_tag keeps CHAINED replications distinct: an sf10
            # doc reads "repl{r}B repl{q} <orig>" — no two of the 100
            # replica combos share a text, so exact-dedup stays honest
            rep = rep.withColumn(
                "text",
                F.concat(F.lit(f"repl{r}{nonce_tag}nonce "), F.col("text")),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if name == "embeddings":
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(i == 0, x * (1.0 + r / 1000.0)).otherwise(x),
                ),
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
    return spark.read.parquet(f"{dest}/{name}.parquet").count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC, help="chainable: pass .scratch/sf1 to build sf10")
    ap.add_argument("--dest", default="/root/repo/.scratch/sf1")
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument(
        "--nonce-tag", default="",
        help="per-chain-level tag baked into document nonces (e.g. 'B' "
             "for the sf1->sf10 pass) so chained replicas never collide",
    )
    ap.add_argument(
        "--tables", default="",
        help="comma-separated subset of scaled tables to build (default "
             "all) — second-decade replicas only need the tables their "
             "measured families read (e.g. events,documents,embeddings), "
             "and sf100 lineitem alone would be ~11 GB",
    )
    args = ap.parse_args()
    only = {t for t in args.tables.split(",") if t}
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    for name in STATIC:
        load(spark, args.src, name).write.mode("overwrite").parquet(
            f"{args.dest}/{name}.parquet"
        )
        print(f"{name}: copied static")
    spans = domain_spans(spark, args.src)
    for name in SCALED:
        if only and name not in only:
            print(f"{name}: skipped (--tables)")
            continue
        n = scale_table(
            spark, name, args.src, args.dest, spans, args.replicas,
            args.nonce_tag,
        )
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
