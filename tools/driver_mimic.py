"""Mimic the driver's verify loop: entry() + every queries()[k] vs oracle_sql()[k]."""
import sys; sys.path.insert(0, "/root/repo")
import importlib.util, duckdb, math, sys
from alpaca_pyspark_spark.session import get_spark
spec = importlib.util.spec_from_file_location('entry_mod', '/root/repo/__spark_entry__.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
spark = get_spark('driver-mimic'); spark.sparkContext.setLogLevel("ERROR")
SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
print('entry rows:', len(m.entry(spark).collect()))
def norm(v):
    if isinstance(v, float):
        return 'NaN' if math.isnan(v) else v
    return v
qs, osql = m.queries(), m.oracle_sql()
fail = []
for k in sorted(qs):
    df = qs[k](spark, SF)
    if k not in osql:
        print(k, 'rows-only:', df.count()); continue
    exp = con.sql(osql[k]); cols = sorted(df.columns)
    ec = [d[0] for d in exp.description]
    if sorted(ec) != cols:
        print(k, 'SCHEMA MISMATCH', cols, sorted(ec)); fail.append(k); continue
    got = sorted([tuple(norm(r[c]) for c in cols) for r in df.collect()], key=repr)
    idx = [ec.index(c) for c in cols]
    want = sorted([tuple(norm(r[i]) for i in idx) for r in exp.fetchall()], key=repr)
    status = 'MATCH' if got == want else 'MISMATCH'
    print(k, status, len(got), 'rows')
    if got != want: fail.append(k)
print('FAILURES:', fail) if fail else print('ALL MATCH (exact, no tolerance)')
sys.exit(1 if fail else 0)
