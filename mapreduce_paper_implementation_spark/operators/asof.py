"""As-of (most-recent-prior) join — an operator Spark's DataFrame API lacks
as a primitive, composed here from union + window so it scales like a single
sort-merge pass instead of an inequality join.

Semantics match DuckDB/QuestDB ASOF JOIN: for every left row, attach the
right row with the greatest right_ts <= left_ts within the same key (NULL if
none). The naive formulation — a theta-join `l.ts >= r.ts` + argmax — is a
near-cross-join per key; this formulation is:

    union(tagged left, tagged right)
    -> one shuffle on key, one sort on (ts, side)
    -> last(right_value, ignoreNulls) over rows-unbounded-preceding window
    -> filter side = left

i.e. exactly one Exchange + one in-partition sort regardless of how many
right rows precede each left row. Equal timestamps resolve right-before-left
(side tag sorts right first), matching ASOF's `>=`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: left's columns plus, per value column v of `right`,
    `v + suffix` holding the value at the most recent right_ts <= left_ts."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = left.columns

    # The right row's values travel as ONE struct that is non-null exactly on
    # right rows — last(struct, ignoreNulls) then finds the most recent RIGHT
    # ROW, not the most recent non-null value: a matched right row whose value
    # column is legitimately NULL yields NULL (DuckDB ASOF semantics), instead
    # of leaking an older row's value.
    import pyspark.sql.types as T

    rstruct_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in value_cols])
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_rvals"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct_type).alias("_rvals"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_r.unionByName(tagged_l).select(
        "*", F.last("_rvals", ignorenulls=True).over(w).alias("_v")
    )
    return merged.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_v").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )
