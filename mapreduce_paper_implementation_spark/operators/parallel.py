"""Scale-adaptive scan-parallelism guard (round-14 optimization).

The engine's CPU-heavy map stages — shingle explodes, per-vector cosine /
argmin folds (interpreted HOFs, SURVEY.md §8.1), minhash banding — run in
the SCAN's partitioning until the first exchange. A small or unsplittable
input (one parquet row group, a gzip file) therefore pins that work to one
core regardless of cluster size: the bench corpus at sf0.1 arrives as ONE
partition, so e.g. kmeans_fit's per-iteration argmin+re-center job ran
single-threaded on a 32-core box.

`spread_partitions` round-robin repartitions ONLY when the input has fewer
partitions than the session's parallelism — the guard is evaluated from
the actual plan, so a 100 TB scan (thousands of splits) never pays the
shuffle, while local/tiny inputs fan out once and every downstream
materialization (localCheckpoint, scoped_persist) stores parallel blocks.
This is the guide's "make partitioning scale-adaptive — derive it from the
input, never a constant tuned for one deployment" rule applied to the
scan side (spark_optimization_guide.md §2).

Determinism: repartition() round-robin is preceded by Spark's local sort
(spark.sql.execution.sortBeforeRepartition, on by default) so the
row-to-partition assignment is reproducible under task retry; every
consumer in this engine aggregates with order-free arithmetic (exact
integers / decimals, or the rounded-double contracts the oracles pin), so
partitioning never changes a result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_partitions(df: DataFrame) -> DataFrame:
    """Fan `df` out to the session's default parallelism iff it currently
    has fewer partitions (e.g. a single-row-group parquet scan); otherwise
    return it untouched. Call at the head of CPU-heavy map pipelines that
    are about to be materialized or consumed by interpreted HOF work."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
