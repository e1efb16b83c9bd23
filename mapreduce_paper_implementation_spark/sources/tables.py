"""Canonical table catalog over the driver-generated parquet fixtures.

The reference's only inputs are whole text files and a header-ful CSV
(/root/reference/mr/worker.go:58-70, /root/reference/mr-main/mrapps/credit.go:23-29).
Our engine is columnar/typed from the start: every table is Parquet with an
explicit schema, so Catalyst gets pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins at any
# scale factor (region: 5 rows, nation: 25 rows — fixed-size in TPC-H).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table. Column pruning + predicate pushdown are left
    to Catalyst — callers express filters declaratively.

    `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; read it as raw nanos (legacy conf) and project to
    TimestampType by exact integer division (floor to microseconds — the same
    truncation DuckDB applies when reading nanos). The projection is a cheap
    per-row expression inside codegen, fine at any scale.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can be written in SQL."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
