"""Incremental rollup maintenance — the timeseries-database "continuous
aggregate" pattern as mergeable partial-aggregate state.

The reference recomputes every job from scratch (a full MapReduce pass per
query, mr/coordinator.go job lifecycle); a 100 TB event stream cannot afford
that. The scale path is the classic partial/final decomposition made
DURABLE: keep a per-(bucket, key) state table whose columns are all
ALGEBRAIC or SKETCH aggregates — count, sum, min, max, HLL sketch for
distinct — so yesterday's state merges with today's delta by one
aggregation over the union, never touching yesterday's raw data again.

    state = rollup_state(day1_events)          # one pass over the delta
    state = merge_rollups(state, rollup_state(day2_events))
    finalize_rollup(state)                     # cheap: |buckets| x |keys|

Merge cost is O(|state|), independent of raw-data size; the state table is
|buckets| x |key cardinality| rows regardless of input. All aggregates here
are associative+commutative (count/sum exactly; HLL sketch union losslessly
over the sketch lattice), so ANY split of the input — by arrival day, by
partition, by cluster — merges to bit-identical count/sum and identical
sketches. q70 gates incremental == one-shot against the SQL oracle; pytest
additionally pins the HLL estimate path (not SQL-expressible — Spark's
DataSketches HLL and DuckDB's approx_count_distinct are different sketches).

Sums use DECIMAL(18,4), not DOUBLE: decimal addition is exact and
associative, so the merged total is bit-equal no matter how the input was
split — a DOUBLE running sum would drift by summation order and break the
incremental == batch contract the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.functions.numeric import floor_div

_STATE_COLS = ("n_events", "sum_value", "min_value", "max_value", "users_hll")


def rollup_state(
    events: DataFrame,
    bucket_s: int = 3600,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    user_col: str = "user_id",
) -> DataFrame:
    """One pass over a delta -> mergeable state per (bucket_epoch_s, key).

    Plan shape: scan -> codegen bucket projection -> one partial+final
    hash aggregate (the HLL sketch is a Spark/DataSketches binary column,
    built JVM-side)."""
    bucket = (floor_div(F.unix_micros(ts_col), bucket_s * 1_000_000) * bucket_s).alias(
        "bucket_epoch_s"
    )
    return events.groupBy(bucket, F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_events"),
        # cast the SUM back down so every state table carries the same
        # decimal(18,4) schema and merges union cleanly in any order
        F.sum(F.col(value_col).cast("decimal(18,4)")).cast("decimal(18,4)").alias("sum_value"),
        F.min(F.col(value_col)).alias("min_value"),
        F.max(F.col(value_col)).alias("max_value"),
        F.hll_sketch_agg(F.col(user_col)).alias("users_hll"),
    )


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Merge any number of state tables into one — one aggregation over the
    union of (small) state tables; raw data is never re-read. At 100 TB this
    is the nightly-maintenance job: |state| rows in, |state| rows out."""
    assert states, "merge_rollups needs at least one state"
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("bucket_epoch_s", "key").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").cast("decimal(18,4)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.hll_union_agg("users_hll").alias("users_hll"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """State -> servable rollup: exact count/sum/min/max plus the HLL
    distinct-user estimate. Cheap (|state| rows, no shuffle)."""
    return state.select(
        "bucket_epoch_s",
        "key",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
        F.hll_sketch_estimate("users_hll").alias("approx_users"),
    )
