"""Incremental SCD type-2 history: the streaming twin of q90
(plans/curation_queries.py:q90_scd2_history).

A nightly warehouse rebuild recomputes every customer's full change history
from all orders — O(history) per refresh. This maintainer folds TIME-ORDERED
order batches into the run table incrementally: per batch it computes the
delta's own gaps-and-islands runs (O(|delta|)), then merges them against
each touched customer's LAST stored run:

- same priority  -> the delta's first run EXTENDS the stored last run
  (order count added, valid_from unchanged),
- different      -> it APPENDS as a new version,
- later delta runs append with versions shifted accordingly, so per-customer
  version numbers stay 1..k contiguous — exactly what the batch query
  produces over the union.

Ordering contract (same as streaming/transitions.py): batches are split on
strict (o_orderdate, o_orderkey) boundaries per customer — all of a
customer's orders in batch i precede its orders in batch i+1. Under that
contract the merge is associative (run-list concatenation with boundary
coalescing is the classic segment monoid on RLE-compressed sequences).

State = the run table itself: (custkey, version, priority, valid_from_us,
n_orders), O(#priority-changes), maintained under the versioned-state /
atomic-pointer exactly-once discipline of streaming/rollup.py. valid_to /
is_current are DERIVED at serving time by one lead() window over the
O(state) run table (`history()`), so closing an interval never rewrites a
stored row. Differential gate: tests/test_scd2.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.streaming.rollup import RollupMaintainer


def _batch_runs(delta: DataFrame) -> DataFrame:
    """q90's gaps-and-islands pair over one time-ordered slice of orders:
    (custkey, bversion 1.., priority, valid_from_us, n_orders)."""
    o = delta.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.unix_micros("o_orderdate").alias("d_us"),
        F.col("o_orderpriority").alias("priority"),
    )
    w = Window.partitionBy("custkey").orderBy("d_us", "o_orderkey")
    changed = (
        F.lag("priority").over(w).isNull()
        | (F.lag("priority").over(w) != F.col("priority"))
    ).cast("long")
    return (
        o.withColumn("version", F.sum(changed).over(w))
        .groupBy("custkey", F.col("version").cast("long").alias("version"), "priority")
        .agg(
            F.min("d_us").alias("valid_from_us"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


def _merge_runs(prev: DataFrame, batch: DataFrame) -> DataFrame:
    """Append the batch's run list onto the stored one, coalescing across
    the boundary when the priority continues. All joins key on custkey."""
    batch = batch.withColumnRenamed("version", "bversion")
    last = prev.groupBy("custkey").agg(
        F.max(F.struct(F.col("version"), F.col("priority"))).alias("l")
    ).select(
        "custkey",
        F.col("l.version").alias("last_version"),
        F.col("l.priority").alias("last_priority"),
    )
    b = batch.join(last, "custkey", "left")
    # does this customer's first delta run continue the stored last run?
    merges = (F.col("last_version").isNotNull()) & (
        F.col("last_priority") == F.col("priority")
    )
    first = F.col("bversion") == 1
    # order-count increments for extended last runs
    inc = (
        b.where(first & merges)
        .select("custkey", F.col("last_version").alias("version"),
                F.col("n_orders").alias("inc"))
    )
    updated_prev = (
        prev.join(inc, ["custkey", "version"], "left")
        .withColumn("n_orders", F.col("n_orders") + F.coalesce("inc", F.lit(0)))
        .drop("inc")
    )
    # customers whose first run merged shift later runs' versions by one less
    merge1 = b.where(first).select(
        "custkey", merges.cast("long").alias("m1")
    )
    appended = (
        b.join(merge1, "custkey")
        .where(~(first & merges))
        .select(
            "custkey",
            (F.coalesce("last_version", F.lit(0)) + F.col("bversion") - F.col("m1"))
            .cast("long")
            .alias("version"),
            "priority",
            "valid_from_us",
            "n_orders",
        )
    )
    return updated_prev.unionByName(appended)


class Scd2Maintainer(RollupMaintainer):
    """Durable SCD2 run table under `state_dir` (RollupMaintainer's
    versioned pointer machinery; only state_fn/merge_fn differ — but merge
    is ORDER-SENSITIVE (prev precedes batch), hence the dedicated class
    rather than a factory, mirroring TransitionMaintainer)."""

    def __init__(self, spark: SparkSession, state_dir: str):
        super().__init__(
            spark, state_dir, state_fn=_batch_runs, merge_fn=_merge_runs
        )

    def history(self) -> DataFrame | None:
        """The q90 output shape over everything ingested: valid_to /
        is_current derived by one lead() window over the O(state) runs."""
        runs = self.current_state()
        if runs is None:
            return None
        wv = Window.partitionBy("custkey").orderBy("version")
        valid_to = F.lead("valid_from_us").over(wv)
        return runs.select(
            "custkey",
            "version",
            "priority",
            "valid_from_us",
            valid_to.alias("valid_to_us"),
            "n_orders",
            valid_to.isNull().alias("is_current"),
        ).orderBy("custkey", "version")
