"""Incremental (algebraic) aggregate maintenance — merge partial rollups.

The property that makes continuous aggregation possible at 100 TB: for
algebraic aggregates (count, sum, min, max — and avg finished from
count+sum), the rollup of the whole equals the re-aggregation of rollups of
any partition of the data. A production pipeline materializes per-window /
per-ingest-batch partials and folds new data in without rescanning history;
this operator is that fold.

This is the same partial/final decomposition Spark's own HashAggregate
does inside one query (the combiner the reference lacks,
reference mr/worker.go:86-89) — lifted to a user-visible operator so it can
span *jobs* (yesterday's materialized rollup + today's delta), not just
stages.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollups(
    rollups: Sequence[DataFrame],
    keys: Sequence[str],
    add_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Re-aggregate partial rollup frames into one.

    add_cols: counts and sums (merge by SUM — exact for integers/decimals);
    min_cols / max_cols: merge by MIN / MAX. Input frames must share the
    (keys + value columns) schema; a key absent from one partial simply
    contributes nothing. One shuffle over the (small) partials, never over
    the raw data.
    """
    assert rollups, "need at least one partial rollup"
    merged = reduce(lambda a, b: a.unionByName(b), rollups)
    aggs = (
        [F.sum(c).alias(c) for c in add_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return merged.groupBy(*keys).agg(*aggs)


def finish_avg(df: DataFrame, count_col: str, sum_col: str, out_col: str, scale: int = 4) -> DataFrame:
    """Finish an average from mergeable (count, sum) state — the reason
    rollups carry count+sum instead of avg (avg is not algebraic)."""
    return df.withColumn(
        out_col,
        F.round(F.col(sum_col) / F.col(count_col), scale).cast("double"),
    )
