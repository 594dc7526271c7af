"""Spot-check a subset of queries against their oracles on any
dataset dir (same exact compare as driver_mimic, without the full
sweep): python tools/check_some.py SF_DIR qid [qid ...]"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import duckdb

from alpaca_pyspark_spark.canon import driver_canon_hash as canon_hash
from alpaca_pyspark_spark.session import get_spark, release_scoped_caches

SF = sys.argv[1]
qids = sys.argv[2:]
spark = get_spark("check-some")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    path = f"{SF}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
from alpaca_pyspark_spark.queries import ORACLE, QUERIES

fail = 0
for k in qids:
    release_scoped_caches()
    try:
        df = QUERIES[k](spark, SF)
        if k not in ORACLE:
            print(k, "rows-only:", df.count())
            continue
        cols = sorted(df.columns)
        exp = con.sql(ORACLE[k])
        ec = [d[0] for d in exp.description]
        got = [tuple(r[c] for c in cols) for r in df.collect()]
        idx = [ec.index(c) for c in cols]
        want = [tuple(r[i] for i in idx) for r in exp.fetchall()]
        ok = len(got) == len(want) and canon_hash(got, cols) == canon_hash(
            want, cols
        )
        print(k, "MATCH" if ok else f"MISMATCH rows {len(got)}/{len(want)}")
        fail += 0 if ok else 1
    except Exception as e:
        print(k, "ERROR", type(e).__name__, str(e)[:120].replace("\n", " "))
        fail += 1
sys.exit(1 if fail else 0)
