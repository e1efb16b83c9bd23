"""Simulate the driver: vanilla SparkSession, import __spark_entry__,
smoke entry(), then run every queries() entry and compare to oracle_sql()
via DuckDB — through the SAME pandas canonicalization the grading driver
uses (testing/compare.py), so dtype-contract bugs (Decimal vs float64)
fail here before they fail in the driver.

Usage: python scripts/driver_sim.py [sf_dir] [query_prefix...]
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
from mapreduce_paper_implementation_spark.testing.compare import (
    compare_query,
    duckdb_connect,
    spark_to_pandas,
)

df = e.entry(spark)
rows = df.collect()
print(f"ENTRY: rows={len(rows)} schema={df.schema.simpleString()}")

qs, os_ = e.queries(), e.oracle_sql()
print(f"CONTRACT: {len(qs)} queries, {len(os_)} oracles, orphan_oracles={set(os_)-set(qs)}")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2:]
con = duckdb_connect(SF)

fails = 0
for name in sorted(qs):
    if only and not any(name.startswith(p) for p in only):
        continue
    t0 = time.time()
    if name not in os_:
        sdf = qs[name](spark, SF)
        try:
            pdf = spark_to_pandas(sdf)
            # the driver canonicalizes rows-only results too: unhashable /
            # unsortable cells (lists) crash it, so surface that here
            from mapreduce_paper_implementation_spark.testing.compare import canonize
            canonize(pdf)
            print(f"{name:28s} ROWS-ONLY rows={len(pdf)} ({time.time()-t0:.1f}s)")
        except Exception as ex:
            fails += 1
            print(f"{name:28s} ROWS-ONLY CANON-CRASH: {ex!r}")
        continue
    res = compare_query(spark, con, name, qs[name], os_[name], SF)
    if not res.ok:
        fails += 1
        print(f"{name:28s} MISMATCH {res.detail[:300]}")
    else:
        print(f"{name:28s} MATCH rows={res.spark_rows} ({time.time()-t0:.1f}s)")
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES")
