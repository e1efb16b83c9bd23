"""Differential gate for streaming/scd2.py:Scd2Maintainer — the incremental
twin of q90. After every time-ordered batch of orders, history() must equal
the batch q90 computation over everything ingested so far (including runs
that EXTEND across a batch boundary — the case a per-batch rebuild gets
wrong); replays are no-ops; uneven splits agree (associativity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.plans.queries import QUERIES
from mapreduce_paper_implementation_spark.sources.tables import load_table
from mapreduce_paper_implementation_spark.streaming.scd2 import Scd2Maintainer


def _rows(df):
    if df is None:
        return []
    return sorted(map(tuple, df.collect()))


def _q90_over(orders):
    """q90's exact pipeline over an arbitrary orders frame."""
    from pyspark.sql import Window

    o = orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros("o_orderdate").alias("d_us"),
        "o_orderpriority",
    )
    w = Window.partitionBy("o_custkey").orderBy("d_us", "o_orderkey")
    changed = (
        F.lag("o_orderpriority").over(w).isNull()
        | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority"))
    ).cast("long")
    runs = (
        o.withColumn("run_id", F.sum(changed).over(w))
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("run_id").cast("long").alias("version"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.min("d_us").alias("valid_from_us"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
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
    )


def _date_batches(orders, n_batches):
    """Strict o_orderdate boundaries: a same-date run never splits, so the
    per-customer ordering contract holds."""
    bounds = [
        r[0]
        for r in orders.select(
            F.expr(
                f"percentile(unix_micros(o_orderdate), array({','.join(str((i + 1) / n_batches) for i in range(n_batches - 1))}))"
            )
        ).collect()
    ][0]
    slices, prev = [], None
    for b in list(bounds) + [None]:
        cond = F.lit(True)
        if prev is not None:
            cond = cond & (F.unix_micros("o_orderdate") > prev)
        if b is not None:
            cond = cond & (F.unix_micros("o_orderdate") <= b)
        slices.append(orders.where(cond))
        prev = b
    return slices


def test_batches_union_to_batch_q90(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    m = Scd2Maintainer(spark, str(tmp_path / "scd2"))
    seen = None
    for i, b in enumerate(_date_batches(orders, 3)):
        m.update(b, i)
        seen = b if seen is None else seen.unionByName(b)
        assert _rows(m.history()) == _rows(_q90_over(seen)), f"batch {i}"
    assert _rows(m.history()) == _rows(QUERIES["q90_scd2_history"](spark, sf_dir))


def test_replay_noop_and_uneven_splits_agree(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    results = []
    for n, name in [(2, "a"), (4, "b")]:
        m = Scd2Maintainer(spark, str(tmp_path / name))
        for i, b in enumerate(_date_batches(orders, n)):
            m.update(b, i)
        if n == 2:
            before = _rows(m.history())
            m.update(_date_batches(orders, 2)[1], 1)  # replay
            assert _rows(m.history()) == before
        results.append(_rows(m.history()))
    assert results[0] == results[1]


def test_boundary_run_extension(spark, tmp_path):
    # one customer, same priority across the batch boundary: the stored run
    # must EXTEND (one version, summed n_orders), not fork a new version
    import datetime

    rows = [
        (1, 7, "O", 100.0, datetime.datetime(2024, 1, 1), "HIGH"),
        (2, 7, "O", 100.0, datetime.datetime(2024, 1, 2), "HIGH"),
        (3, 7, "O", 100.0, datetime.datetime(2024, 1, 3), "HIGH"),
        (4, 7, "O", 100.0, datetime.datetime(2024, 1, 4), "LOW"),
    ]
    orders = spark.createDataFrame(
        rows,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    m = Scd2Maintainer(spark, str(tmp_path / "ext"))
    m.update(orders.where(F.col("o_orderkey") <= 2), 0)
    m.update(orders.where(F.col("o_orderkey") > 2), 1)
    got = _rows(m.history())
    assert [(r[0], r[1], r[2], r[5], r[6]) for r in got] == [
        (7, 1, "HIGH", 3, False),
        (7, 2, "LOW", 1, True),
    ]
