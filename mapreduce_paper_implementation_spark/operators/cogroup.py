"""Cogrouped applyInPandas — the "arbitrary two-table per-key program"
surface: `a.groupBy(k).cogroup(b.groupBy(k)).applyInPandas(f, schema)` hands
f BOTH sides' rows for one key as pandas DataFrames.

This is the generalization of the reference's Reduce UDF
(/root/reference/mr/worker.go:33 — one key, all values, arbitrary code) to
two inputs, i.e. the classic MapReduce reduce-side join written the way the
OSDI'04 paper describes it (§2.3 "per-key join"), but Arrow-batched.

Demonstrated here as an alternative as-of join implementation
(pandas.merge_asof per key) — semantics oracle-gated against the same DuckDB
ASOF JOIN truth as the window-based JVM path in operators/asof.py. Use the
JVM path in production (one shuffle, no Python); use this pattern when the
per-key logic genuinely needs imperative code (model scoring, curve
fitting, constraint solvers).

Scale: each task holds ONE key's rows from both sides in memory — bounded by
the largest key group, not the table. Skewed keys need salting before this
operator, same as any groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join via cogrouped applyInPandas + pandas.merge_asof.
    Same contract as operators/asof.py:asof_join: left's columns plus, per
    value column v of `right`, `v + suffix` = v at the greatest
    right_ts <= left_ts for the same key (NULL if none)."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]
    lcols = list(left.columns)
    out_fields = [T.StructField(c, left.schema[c].dataType) for c in lcols] + [
        T.StructField(f"{c}{suffix}", right.schema[c].dataType) for c in value_cols
    ]
    out_schema = T.StructType(out_fields)
    rsel = right.select(on, F.col(right_ts).alias("_rt"), *value_cols)

    def merge(lpdf, rpdf):
        import pandas as pd

        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        rpdf = rpdf.sort_values("_rt", kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[on]),
            left_on=left_ts,
            right_on="_rt",
            direction="backward",
            allow_exact_matches=True,
        )
        out = merged[lcols].copy()
        for c in value_cols:
            out[f"{c}{suffix}"] = merged[c]
        return out

    return (
        left.groupBy(on)
        .cogroup(rsel.groupBy(on))
        .applyInPandas(merge, out_schema)
    )
