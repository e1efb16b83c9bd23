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


def _normalize_timestamp(df: DataFrame, col: str) -> DataFrame:
    """Project a timestamp column to session-zone TimestampType regardless of
    how the writer encoded it. Fixture generators have shipped the same column
    as parquet TIMESTAMP(NANOS) (read as raw int64 nanos under the legacy
    conf) and as plain TIMESTAMP(MICROS) (read as TIMESTAMP or TIMESTAMP_NTZ);
    a catalog must read what the file gives it, so branch on the read dtype
    instead of assuming one encoding:

    - LongType: nanos-as-long → floor-divide to micros (the same truncation
      DuckDB applies when reading nanos) and build a timestamp.
    - TIMESTAMP_NTZ: cast — exact under the UTC session timezone
      (session.py pins spark.sql.session.timeZone=UTC).
    - TimestampType: already canonical, no-op.

    Every branch is a cheap per-row codegen expression, fine at any scale.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dtype = df.schema[col].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    if not isinstance(dtype, T.TimestampType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table. Column pruning + predicate pushdown are left
    to Catalyst — callers express filters declaratively.

    `events.ts` is normalized to TimestampType whatever the on-disk encoding
    (see _normalize_timestamp) — the legacy nanosAsLong conf stays on so a
    TIMESTAMP(NANOS) fixture reads as int64 instead of erroring in the
    vectorized reader.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return _normalize_timestamp(df, "ts")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can be written in SQL."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
