"""Dev loop: run every manifest query against the DuckDB oracle at a given sf.

Usage: python scripts/dev_compare.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_paper_implementation_spark.plans.queries import ORACLES, QUERIES
from mapreduce_paper_implementation_spark.session import get_spark
from mapreduce_paper_implementation_spark.testing.compare import compare_query, duckdb_connect


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark(shuffle_partitions=8)
    con = duckdb_connect(sf_dir)
    failed = 0
    for name in names:
        t0 = time.time()
        if name not in ORACLES:
            try:
                n = QUERIES[name](spark, sf_dir).count()
                print(f"{name:28s} ROWS-ONLY rows={n} ({time.time()-t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                failed += 1
                print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            continue
        try:
            res = compare_query(spark, con, name, QUERIES[name], ORACLES[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"{name:28s} ERROR {type(e).__name__}: {str(e)[:600]}")
            continue
        status = "OK" if res.ok else "FAIL"
        if not res.ok:
            failed += 1
        print(f"{name:28s} {status} rows={res.spark_rows}/{res.oracle_rows} ({time.time()-t0:.1f}s) {res.detail[:500]}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
