"""Distributed global sort / global ranking — the "distributed sort" workload
of the MapReduce paper (§2.3; the reference ships the paper as
mapreduce-paper.pdf but implements no sort app; the closest artifact is the
sequential engine's global key sort, /root/reference/mr-main/mrsequential.go:61).

A naive global rank (`row_number() OVER (ORDER BY ...)` with no PARTITION BY)
collapses the whole table into ONE task — the classic 100 TB killer. This
module implements the TeraSort-shaped two-pass alternative:

1. range-partition on the sort key (Spark samples boundaries — the paper's
   "ordering guarantee" partitioner);
2. rank locally inside each sorted range partition;
3. add per-partition row-count offsets (an n_partitions-row broadcast join).

Every heavy stage is parallel over the range partitions; the only global
object is the offsets table (one row per partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    n_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based dense global rank under the total order `order_by`.

    `order_by` must be a TOTAL order (include a unique tiebreak column) or
    the assigned ranks are nondeterministic between runs.

    Plan shape: ONE range exchange, MATERIALIZED eagerly (see below),
    feeding both the local-rank window and the per-partition counts; one
    tiny single-row-per-partition aggregate; one broadcast join. No stage
    sees more than one range partition of data.

    CORRECTNESS NOTE (round-12 fix, found by the q127 x10 replay; hardened
    round 13 per ADVICE): the two consumers of `ranged` MUST observe the
    same partition boundaries — the local rank is joined to the
    counts-derived offsets BY `_pid`. AQE exchange reuse usually guarantees
    that, but when reuse fails (observed with checkpointed inputs under
    composed plans), each consumer re-evaluates repartitionByRange as a NEW
    shuffle, and RangePartitioner's boundary sampling is seeded by the
    shuffle id — two shuffles can draw DIFFERENT boundaries, so `_pid`
    means different ranges in the two branches and rows near each boundary
    get offsets from the wrong partition (observed: split-blocks off by 8
    rows in 50k, surfacing as negative shard ids downstream).

    Round 12 pinned the boundaries with scoped_persist, but that made
    correctness RIDE ON THE CACHE, contradicting caching.py's contract
    that unpersisting is always safe (a release_persisted() before the
    derived frame materialized would silently reintroduce the race).
    localCheckpoint(eager=True) instead: the evaluated partitioning is
    written to executor storage and the lineage TRUNCATED, so no later
    cache release can ever cause re-evaluation — both branches provably
    read one frozen set of ranges. Trade-off: local checkpoints are not
    lineage-recoverable (an executor loss fails the job for retry instead
    of recomputing the lost partitions) — the same trade q127's
    stage-boundary checkpoints already accept, and the only sound one
    here, because a RECOMPUTE is exactly what re-samples the boundaries.

    STORAGE LIFETIME (round-14 ADVICE note): the checkpointed blocks are
    freed only when the JVM GCs the frame — a long session running many
    queries accumulates them. Sweep at query boundaries with
    operators/caching.py:free_local_checkpoints (bench.py and driver_sim
    do); its use-after-free fails loudly, never silently wrong.
    """
    spark = df.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_by)
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    # offsets: exclusive prefix sum over partition ids — n rows total, so the
    # single-partition window here is over the COUNTS, never the data.
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    val_col: str,
    out_col: str = "cum_before",
    n_partitions: int | None = None,
) -> DataFrame:
    """Append the EXCLUSIVE prefix sum of `val_col` under the total order
    `order_by` — the classic parallel-scan primitive (Blelloch scan,
    expressed in the same TeraSort shape as global_rank): range-partition
    on the order key, per-partition running sums inside each sorted range,
    then one bounded per-partition-totals pass whose exclusive offsets
    broadcast back. No stage sees more than one range partition; the only
    global object is the n_partitions-row offsets table.

    `order_by` must be a TOTAL order (unique tiebreak) or the prefix is
    nondeterministic. Same eager-localCheckpoint boundary-consistency
    discipline as global_rank (both consumers of the ranged frame must
    observe ONE sampled partitioning; see the round-12/13 notes above).

    Used by q132 (token-balanced shard export: shard boundaries at equal
    cumulative-token targets); any "running total at 100 TB" need routes
    here rather than through a single-task `SUM() OVER (ORDER BY ...)`.
    """
    spark = df.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_lsum", F.coalesce(F.sum(val_col).over(w_local), F.lit(0)).cast("long")
    )
    totals = ranged.groupBy("_pid").agg(F.sum(val_col).cast("long").alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).cast("long")
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lsum")).cast("long"))
        .drop("_pid", "_lsum", "_off")
    )
