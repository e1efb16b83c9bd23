"""Differential gate for streaming/transitions.py:TransitionMaintainer —
the incremental twin of q88 (plans/curation_queries.py). After every batch
the maintained matrix must equal the batch q88 computation over everything
ingested so far (including CROSS-BATCH boundary transitions — the part a
naive per-batch aggregation drops); replays must be no-ops; merge must be
associative across uneven splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.plans.queries import QUERIES
from mapreduce_paper_implementation_spark.sources.tables import load_table
from mapreduce_paper_implementation_spark.streaming.transitions import (
    TransitionMaintainer,
)


def _rows(df):
    if df is None:
        return []
    return sorted(
        (r["event_type"], r["next_type"], r["n_transitions"], r["prob"])
        for r in df.collect()
    )


def _batch_q88_over(spark, events):
    """q88's exact pipeline applied to an arbitrary events frame."""
    from pyspark.sql import Window

    e = events.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    t = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )
    row_total = F.sum("n_transitions").over(Window.partitionBy("event_type"))
    return t.withColumn(
        "prob",
        F.round(F.col("n_transitions").cast("double") / row_total.cast("double"), 6),
    )


def _time_batches(events, n_batches: int):
    """Split events into n time-ordered slices (the in-order micro-batch
    contract: all of a user's events in batch i precede its events in i+1)."""
    ts_bounds = [
        r[0]
        for r in events.select(
            F.expr(
                f"percentile(unix_micros(ts), array({','.join(str((i + 1) / n_batches) for i in range(n_batches - 1))}))"
            )
        ).collect()
    ][0]
    slices = []
    prev = None
    for b in list(ts_bounds) + [None]:
        cond = F.lit(True)
        if prev is not None:
            cond = cond & (F.unix_micros("ts") > prev)
        if b is not None:
            cond = cond & (F.unix_micros("ts") <= b)
        slices.append(events.where(cond))
        prev = b
    return slices


def test_batches_union_to_batch_q88(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    batches = _time_batches(events, 4)
    m = TransitionMaintainer(spark, "/tmp/transitions_state_test")
    import shutil

    shutil.rmtree("/tmp/transitions_state_test", ignore_errors=True)
    m = TransitionMaintainer(spark, "/tmp/transitions_state_test")
    seen = None
    for i, b in enumerate(batches):
        m.update(b, i)
        seen = b if seen is None else seen.unionByName(b)
        assert _rows(m.transitions()) == _rows(_batch_q88_over(spark, seen)), (
            f"batch {i}"
        )
    # the final maintained matrix equals the manifest query itself
    assert _rows(m.transitions()) == _rows(
        QUERIES["q88_event_transitions"](spark, sf_dir)
    )


def test_replay_is_noop(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    b0, b1 = _time_batches(events, 2)
    m = TransitionMaintainer(spark, str(tmp_path / "trans"))
    m.update(b0, 0)
    m.update(b1, 1)
    after = _rows(m.transitions())
    m.update(b1, 1)  # at-least-once replay of the same batch id
    m.update(b0, 0)  # stale replay
    assert _rows(m.transitions()) == after


def test_uneven_splits_agree(spark, sf_dir, tmp_path):
    # associativity probe: 2-way and 5-way time splits land on identical state
    events = load_table(spark, sf_dir, "events")
    results = []
    for n, name in [(2, "a"), (5, "b")]:
        m = TransitionMaintainer(spark, str(tmp_path / name))
        for i, b in enumerate(_time_batches(events, n)):
            m.update(b, i)
        results.append(_rows(m.transitions()))
    assert results[0] == results[1]


def test_single_event_users_bridge_batches(spark, tmp_path):
    # a user with ONE event per batch produces only boundary transitions —
    # the pure cross-batch case a per-batch lead() can never see
    rows = [
        (1, "2024-01-01 00:00:00", 9, "view", 0.0, "{}"),
        (2, "2024-01-01 00:01:00", 9, "click", 0.0, "{}"),
        (3, "2024-01-01 00:02:00", 9, "purchase", 0.0, "{}"),
    ]
    events = (
        spark.createDataFrame(
            rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
        )
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    m = TransitionMaintainer(spark, str(tmp_path / "solo"))
    for i in range(3):
        m.update(events.where(F.col("event_id") == i + 1), i)
    got = _rows(m.transitions())
    assert got == [
        ("click", "purchase", 1, 1.0),
        ("view", "click", 1, 1.0),
    ]


def test_vacuum_policy_on_transition_maintainer(spark, sf_dir, tmp_path):
    """TransitionMaintainer inherits the versioned-state vacuum: under a
    vacuum_keep=1 policy only the committed version survives each batch,
    and the served matrix still equals the full-history q88 computation
    (vacuum drops superseded versions, never folded history)."""
    import os

    from mapreduce_paper_implementation_spark.streaming.policy import (
        MaintainedIngest,
        MaintenancePolicy,
    )

    events = load_table(spark, sf_dir, "events")
    batches = _time_batches(events, 3)
    state = str(tmp_path / "trans")
    m = MaintainedIngest(
        TransitionMaintainer(spark, state), MaintenancePolicy(vacuum_keep=1)
    )
    for i, b in enumerate(batches):
        m.update(b, i)
    versions = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert versions == ["v0000000002"]
    assert [e.action for e in m.events] == ["vacuum"] * 2
    assert _rows(m.maintainer.transitions()) == _rows(
        QUERIES["q88_event_transitions"](spark, sf_dir)
    )
