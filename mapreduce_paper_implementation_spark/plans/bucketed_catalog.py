"""Bucketed relational catalog — the persistent storage layout that removes
fact-join shuffles (VERDICT r07 ask #2: generalize the q77 zero-exchange
MERGE demo to the join family).

At 100 TB the dominant physical cost of q10/q11/q98 is shuffling fact
tables for their key joins. Bucketing pays each shuffle ONCE at write time
(sources/bucketing.py): tables hash-clustered on the join key are read as
co-located buckets, and the join plans with NO Exchange on the bucketed
side. This module materializes that layout for the catalog's join keys and
re-runs the SAME query shapes against it:

- customer_bck / orders_bck   bucketed on custkey  -> q10's join, and the
  customer side of q11's second join, are exchange-free;
- orders_bok / lineitem_bok   bucketed on orderkey -> q11's fact-fact join
  (the single biggest shuffle in the manifest) is exchange-free;
- cust_snap_old / cust_snap_new bucketed on custkey -> q98's full-outer CDC
  join is exchange-free (both snapshots are STORED tables, as real CDC
  snapshots are);
- events_bck bucketed on user_id, sorted (user_id, t_us, event_id) -> the
  per-user BEHAVIORAL family (q84 funnel windows, q88 transition lead
  window, q101's purchase⋈click self-equi-join) runs with zero user_id
  Exchange — the biggest remaining shuffle family in PLANS.md (VERDICT r08
  ask #3). The sort columns extend the window orderBy, so with one file
  per bucket the pre-window Sort drops too; t_us/cents are materialized at
  write (a stored sortBy cannot order by unix_micros(ts) on the fly).

The query bodies are NOT duplicated: each twin calls the same shape
function the registered query calls (orders_by_segment_shape,
regional_revenue_shape, snapshot_diff_readout), so bucketed and plain
answers are structurally the same computation over different layouts —
tests/test_bucketed_catalog.py pins both the per-query Exchange-count drop
and result equality. scripts/bench_bucketed.py records bucketed vs
unbucketed wall-times for BASELINE.md.

Reference analog: the reference's fixed `ihash(key) % nReduce` intermediate
partitioning (/root/reference/mr/worker.go:86-89) is a transient per-job
bucketing; this catalog is the persistent, cross-query version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_paper_implementation_spark.sources.bucketing import (
    drop_bucketed,
    write_bucketed,
)
from mapreduce_paper_implementation_spark.sources.tables import load_table

# table name -> (source table, bucket column, within-bucket sort column)
CATALOG: dict[str, tuple[str, str, str]] = {
    "customer_bck": ("customer", "c_custkey", "c_custkey"),
    "orders_bck": ("orders", "o_custkey", "o_custkey"),
    "orders_bok": ("orders", "o_orderkey", "o_orderkey"),
    "lineitem_bok": ("lineitem", "l_orderkey", "l_orderkey"),
}

_SNAP_COLS = ["c_custkey", "c_acctbal", "c_mktsegment"]


def build_catalog(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8, force: bool = False
) -> None:
    """Materialize the bucketed catalog (idempotent; `force` rewrites).
    One shuffle per table at write time — the amortized cost every
    subsequent bucket-key join avoids. All tables share `n_buckets` so
    bucket-bucket joins align without any runtime repartitioning."""
    existing = {t.name for t in spark.catalog.listTables()}
    for table, (src, key, sort) in CATALOG.items():
        if force or table not in existing:
            drop_bucketed(spark, table)
            write_bucketed(
                load_table(spark, sf_dir, src), table, key, n_buckets, sort_col=sort
            )
    # q98's CDC snapshots: stored tables, both bucketed on the diff key
    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        plant_new_snapshot,
    )

    cust = load_table(spark, sf_dir, "customer").select(*_SNAP_COLS)
    for table, frame in (
        ("cust_snap_old", cust),
        ("cust_snap_new", plant_new_snapshot(cust)),
    ):
        if force or table not in existing:
            drop_bucketed(spark, table)
            write_bucketed(frame, table, "c_custkey", n_buckets, sort_col="c_custkey")
    # the behavioral family's layout: one stored projection of events,
    # bucketed on the per-user key, within-bucket sorted by the window
    # order — the head frame is the SAME function the registered queries
    # project through (curation_queries.behavioral_events_frame)
    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        behavioral_events_frame,
    )

    if force or "events_bck" not in existing:
        drop_bucketed(spark, "events_bck")
        write_bucketed(
            behavioral_events_frame(load_table(spark, sf_dir, "events")),
            "events_bck",
            "user_id",
            n_buckets,
            sort_col=["user_id", "t_us", "event_id"],
        )


def q10_bucketed(spark: SparkSession) -> DataFrame:
    """q10 over the custkey-bucketed catalog: the orders⋈customer join
    reads co-located buckets — zero join Exchange (only the tiny post-agg
    and output-sort exchanges remain)."""
    from mapreduce_paper_implementation_spark.plans.queries import (
        orders_by_segment_shape,
    )

    return orders_by_segment_shape(
        spark.table("orders_bck"), spark.table("customer_bck")
    )


def q11_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 with lineitem⋈orders on co-located orderkey buckets (the
    manifest's biggest fact-fact shuffle, gone) and the customer join
    side served from custkey buckets (only the joined fact side still
    shuffles — its key changes from orderkey to custkey mid-plan, which
    no static layout can avoid). nation/region are fixed-size dimensions:
    plain scans + broadcast hints inside the shape; only the three big
    tables come bucketed."""
    from mapreduce_paper_implementation_spark.plans.queries import (
        regional_revenue_shape,
    )

    return regional_revenue_shape(
        spark.table("customer_bck"),
        spark.table("orders_bok"),
        spark.table("lineitem_bok"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q84_bucketed(spark: SparkSession) -> DataFrame:
    """q84's funnel over the user_id-bucketed events: all three stacked
    per-user windows read co-located, pre-sorted buckets — zero Exchange
    (and zero Sort, one file per bucket) until the tiny day rollup."""
    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        funnel_shape,
    )

    return funnel_shape(spark.table("events_bck"))


def q88_bucketed(spark: SparkSession) -> DataFrame:
    """q88's transition matrix over the user_id-bucketed events: the lead
    window rides the bucketed scan; the only shuffle left is the
    O(|types|^2) pair aggregate."""
    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        event_transitions_shape,
    )

    return event_transitions_shape(spark.table("events_bck"))


def q101_bucketed(spark: SparkSession) -> DataFrame:
    """q101's attribution over the user_id-bucketed events: purchase and
    click sides are co-located buckets of ONE stored table, so the
    interval equi-join plans with zero user_id Exchange."""
    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        click_attribution_shape,
    )

    return click_attribution_shape(spark.table("events_bck"))


def q98_bucketed(spark: SparkSession) -> DataFrame:
    """q98 over STORED snapshots bucketed on the diff key: the full-outer
    CDC join — the query's intrinsic cost — runs with zero Exchange."""
    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        snapshot_diff_readout,
    )

    return snapshot_diff_readout(
        spark.table("cust_snap_old"), spark.table("cust_snap_new")
    )
