"""Bucketed tables: pre-shuffled storage for co-located (exchange-free)
joins and aggregations.

At 100 TB the single most expensive physical operation is the fact-fact
shuffle (orders ⋈ lineitem on orderkey moves both tables across the
network). Bucketing pays that shuffle ONCE at write time: both tables are
hash-clustered into the same number of buckets on the join key, so every
subsequent join or groupBy on that key reads co-located buckets and the
plan contains no Exchange at all. This is Spark's native bucketing
(`bucketBy` + `saveAsTable`); on a real deployment the same layout comes
from the table format's clustering (Iceberg/Delta).

The reference's analog is its fixed `ihash(key) % nReduce` intermediate
files (/root/reference/mr/worker.go:86-89) — a transient, per-job bucketing;
ours is persistent and reusable across queries.
"""

from __future__ import annotations

import shutil
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop a managed bucketed table AND its warehouse directory.

    `DROP TABLE IF EXISTS` alone is not idempotent across metastore
    lifetimes: if a previous process died between `saveAsTable` and its
    cleanup, a fresh Derby metastore no longer knows the table, the DROP
    no-ops, and the orphaned `spark-warehouse/<table>/` directory makes
    every later `saveAsTable` fail with LOCATION_ALREADY_EXISTS. Removing
    the location explicitly makes create-after-crash safe.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # unquote: warehouse.dir is a URI — a path with spaces/non-ASCII is
    # percent-encoded, and an encoded rmtree target silently misses the
    # orphan directory (ignore_errors), defeating the recovery this exists for
    warehouse = unquote(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally removes the Sort from sort-merge
    plans (SortMergeJoin reads pre-sorted runs); a multi-column sort_col
    (e.g. (user_id, t_us, event_id)) serves window queries whose orderBy
    extends the partition key."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        cols = [sort_col] if isinstance(sort_col, str) else list(sort_col)
        w = w.sortBy(cols[0], *cols[1:])
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with matching
    bucket counts Spark plans a SortMergeJoin whose both sides read
    directly from buckets — zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on)
