"""Differential harness: Spark result vs DuckDB oracle on the same tables.

Mirrors the reference's differential testing scheme (distributed output vs
`mrsequential` golden, /root/reference/test-mr.sh:36-66) with DuckDB as the
sequential oracle, and mirrors the driver's comparison: row count + column
names + order-insensitive value comparison with columns sorted by name.
"""

from __future__ import annotations

import decimal
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from mapreduce_paper_implementation_spark.sources.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    query_fn,
    oracle_sql: str,
    sf_dir: str,
) -> CompareResult:
    sdf: DataFrame = query_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # Oracles are written against the driver's sf0.01 run; retarget any
    # absolute fixture path at the sf under test.
    sql = oracle_sql.replace("/fixtures/credit/sf0.01/", f"/fixtures/credit/{_sf_name(sf_dir)}/")
    cur = con.execute(sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    sc, sv = _normalize(spark_cols, spark_rows)
    oc, ov = _normalize(oracle_cols, oracle_rows)

    if sc != oc:
        return CompareResult(name, False, len(sv), len(ov), f"columns differ: spark={sc} oracle={oc}")
    if len(sv) != len(ov):
        return CompareResult(name, False, len(sv), len(ov), "row counts differ")
    if sv != ov:
        diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
        return CompareResult(name, False, len(sv), len(ov), f"values differ, first diffs: {diffs}")
    return CompareResult(name, True, len(sv), len(ov))


def _sf_name(sf_dir: str) -> str:
    import os

    return os.path.basename(sf_dir.rstrip("/"))
