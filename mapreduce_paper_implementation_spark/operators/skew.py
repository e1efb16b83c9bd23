"""Skew mitigation operators: salted aggregation and salted broadcast-side
replication join.

Heavy-hitter keys are the canonical 100 TB failure mode the reference simply
inherits (its FNV-32a bucketing, /root/reference/mr/worker.go:25-29, sends
every occurrence of a hot key to ONE reduce task). Spark's AQE skew-join
splitting handles the join case automatically; these operators cover the two
shapes AQE does not:

- `salted_group_agg`: two-stage aggregation for aggregations whose partial
  state is itself large per key (collect_list-style). For algebraic aggs
  (count/sum/min/max) Spark's partial aggregation already solves skew — the
  test asserts both paths agree so the technique stays correctness-gated.
- `salted_join`: explode the small side N ways so a hot key's rows spread
  over N tasks. Useful when the big side is too skewed even for AQE's
  split threshold, or on engines/paths without AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: stage 1 groups on (key, salt) where
    salt = pmod(xxhash64(whole row cols), n_salts) spreads a hot key over
    n_salts reducers; stage 2 re-aggregates the n_salts partials per key.

    agg_exprs maps output name -> (partial aggregate Column, combiner) where
    combiner in {"sum", "min", "max"} states how stage-2 merges the n_salts
    partials — only algebraic aggregates (agg(agg(parts)) == agg(whole))
    qualify. Example:
        {"cnt": (F.count("*"), "sum"), "total": (F.sum("value"), "sum")}
    """
    combiners = {"sum": F.sum, "min": F.min, "max": F.max}
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("_salt")
    stage1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, (c, _) in agg_exprs.items()]
    )
    return stage1.groupBy(*key_cols).agg(
        *[combiners[comb](f"_p_{name}").alias(name) for name, (_, comb) in agg_exprs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: tag each big-side row with a random-ish salt in
    [0, n_salts), explode the small side once per salt value, and join on
    (key, salt). A key with 10^9 occurrences lands on n_salts tasks instead
    of one. The small side grows n_salts-fold — size it like a broadcast.

    Salt is derived deterministically from xxhash64 of the big side's whole
    key + a per-row uniform id, so repeated runs produce identical plans.

    Only inner/left are supported: for right/full/anti variants every
    unmatched small-side row appears once PER SALT COPY (n_salts duplicates
    of each unmatched row), which is wrong — use a plain join (AQE skew
    handling) for outer shapes."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "outer variants would duplicate unmatched small-side rows n_salts times"
        )
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(n_salts))
    )
    small_s = small.select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))
        ).alias("_salt"),
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
