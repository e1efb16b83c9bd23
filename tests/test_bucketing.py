"""Bucketed co-located join: the fact-fact join runs with zero Exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.sources.bucketing import (
    bucketed_join,
    drop_bucketed,
    write_bucketed,
)
from mapreduce_paper_implementation_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # pre-clean BEFORE the writes: an orphaned warehouse directory from a
    # crashed prior run fails saveAsTable with LOCATION_ALREADY_EXISTS
    # (fresh metastore's DROP can't see it — see drop_bucketed docstring).
    drop_bucketed(spark, "orders_b")
    drop_bucketed(spark, "lineitem_b")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        sort_col="o_orderkey",
    )
    yield "orders_b", "lineitem_b"
    drop_bucketed(spark, "orders_b")
    drop_bucketed(spark, "lineitem_b")


def test_bucketed_join_no_exchange(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the test exercises the co-located SMJ path the
    # way a 100 TB fact-fact join would run
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan  # buckets are already co-located
        # correctness vs the plain parquet join
        want = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    _, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table(rt).groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # aggregation on the bucket key reuses the storage clustering
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
