"""Sinks: partitioned Parquet (primary), CSV/JSON (interchange), and the
reference's text key-value format (compat).

Reference sink: one `mr-out-<j>.txt` per reduce partition with `"key value"`
lines (/root/reference/mr/worker.go:148-157, format at worker.go:156; called
"the correct format" at mrsequential.go:82-83). Line order within a file is
nondeterministic there (Go map iteration) and correctness is defined on the
sorted union (test-mr.sh:58) — so this writer makes NO ordering promise
either, only partition count.

All writers go through Spark's commit protocol: task output is atomic
(temp-file + rename), re-executed tasks cannot double-append — the two
reference hazards documented in SURVEY.md §4.2.1-2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Primary sink. `partition_by` produces hive-style directory partitioning
    so downstream reads get partition pruning on those columns."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_text_kv(
    df: DataFrame,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
    n_files: int = 10,
    mode: str = "overwrite",
) -> None:
    """Reference-compatible text sink: n_files part files of '"key value"'
    lines. DataFrame-native (no RDD round-trip): a single-column projection
    hash-repartitioned on the key — the same key->file mapping idea as
    ihash(key) % nReduce (/root/reference/mr/worker.go:86-89), via Spark's
    HashPartitioning instead of FNV-32a."""
    line = F.concat_ws(
        " ", F.col(key_col).cast("string"), F.col(value_col).cast("string")
    ).alias("value")
    df.repartition(n_files, F.col(key_col)).select(line).write.mode(mode).text(path)
