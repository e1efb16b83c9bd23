"""Opaque-binary ingestion: the entry point of the multimodal pipeline.

Spark's built-in `binaryFile` source reads each file as one row of
(path, modificationTime, length, content binary) — the 'whole file = one
record' model the reference uses for text inputs (reference
mr/worker.go:58-70, one map task per file), generalized to media blobs.

Scale notes: binaryFile supports pathGlobFilter + recursiveFileLookup and
parallelizes at file granularity, like the reference's one-map-per-file.
For 100 TB of small media files the production shape is to compact into
parquet with a binary column first (small-files problem); `to_media_table`
is that compaction step — its output is exactly the (doc_id, source, media)
schema `operators/multimodal.py` consumes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """One row per file: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def to_media_table(files: DataFrame) -> DataFrame:
    """Normalize raw binaryFile rows to the pipeline's media schema:
    doc_id = file stem when numeric (stable across re-ingest), else a
    64-bit hash of the path; source = parent directory name."""
    stem = F.regexp_extract(F.col("path"), r"([^/]+?)(?:\.[^./]*)?$", 1)
    return files.select(
        F.when(stem.rlike(r"^[0-9]+$"), stem.cast("long"))
        .otherwise(F.xxhash64("path"))
        .alias("doc_id"),
        F.element_at(F.split("path", "/"), -2).alias("source"),
        F.col("content").alias("media"),
    )
