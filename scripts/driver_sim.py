"""Simulate the driver: vanilla SparkSession, import __spark_entry__,
smoke entry(), then run every queries() entry at sf0.01 and compare to
oracle_sql() via DuckDB with pre-registered views."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print(f"ENTRY: rows={len(rows)} schema={df.schema.simpleString()}")
print("ENTRY sample:", rows[:2])

qs, os_ = e.queries(), e.oracle_sql()
print(f"CONTRACT: {len(qs)} queries, {len(os_)} oracles, orphan_oracles={set(os_)-set(qs)}")

con = duckdb.connect()
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

import decimal, math
def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def c(v):
        if isinstance(v, decimal.Decimal): return str(v)
        if isinstance(v, float): return "nan" if math.isnan(v) else repr(v)
        return str(v)
    return [cols[i] for i in order], sorted(tuple(c(r[i]) for i in order) for r in rows)

fails = 0
for name in sorted(qs):
    t0 = time.time()
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in os_:
        print(f"{name:28s} ROWS-ONLY rows={len(srows)}")
        continue
    cur = con.execute(os_[name])
    ocols = [d[0] for d in cur.description]; orows = cur.fetchall()
    sc, sv = norm(sdf.columns, srows); oc, ov = norm(ocols, orows)
    ok = sc == oc and sv == ov
    if not ok:
        fails += 1
        print(f"{name:28s} MISMATCH cols {sc} vs {oc}; first: {[x for x in zip(sv,ov) if x[0]!=x[1]][:2]}")
    else:
        print(f"{name:28s} MATCH rows={len(sv)} ({time.time()-t0:.1f}s)")
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES")
