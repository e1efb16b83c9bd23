"""Keyed upsert (MERGE) semantics — operators/merge.py.

Covers every ANSI MERGE branch (update / insert / keep / delete-on-
tombstone / unmatched-tombstone no-op), the NULL-replacement rule (SET col
= src.col, not COALESCE), the duplicate-source-key contract (raise without
version_col, latest-wins with it), and the replay-idempotence property
merge(merge(t, s), s) == merge(t, s).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.merge import merge_upsert

SCHEMA = "k long, name string, val double"
SRC_SCHEMA = "k long, name string, val double, dead boolean"


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)], SCHEMA
    )


def test_all_four_branches(spark, target):
    src = spark.createDataFrame(
        [
            (2, "b2", 20.0, False),  # matched -> UPDATE
            (5, "e", 50.0, False),  # unmatched -> INSERT
            (3, "x", 0.0, True),  # matched tombstone -> DELETE
            (9, "y", 0.0, True),  # unmatched tombstone -> no-op
        ],
        SRC_SCHEMA,
    )
    got = _rows(merge_upsert(target, src, ["k"], tombstone_col="dead"))
    assert got == {
        (1, "a", 1.0),  # kept
        (2, "b2", 20.0),  # updated
        (4, "d", 4.0),  # kept
        (5, "e", 50.0),  # inserted
    }


def test_update_replaces_with_null(spark, target):
    """MERGE is SET col = src.col — a NULL source value must overwrite."""
    src = spark.createDataFrame([(1, None, None)], SCHEMA)
    got = _rows(merge_upsert(target, src, ["k"]))
    assert (1, None, None) in got
    assert len(got) == 4


def test_duplicate_source_keys_raise_without_version(spark, target):
    src = spark.createDataFrame([(2, "p", 1.0), (2, "q", 2.0)], SCHEMA)
    with pytest.raises(Exception, match="duplicate source keys"):
        merge_upsert(target, src, ["k"]).collect()


def test_version_col_latest_wins(spark, target):
    src = spark.createDataFrame(
        [(2, "old", 1.0, False, 1), (2, "new", 9.0, False, 2)],
        SRC_SCHEMA + ", v int",
    )
    got = _rows(
        merge_upsert(target, src, ["k"], tombstone_col="dead", version_col="v")
    )
    assert (2, "new", 9.0) in got and not any(r[1] == "old" for r in got)


def test_version_tie_prefers_tombstone(spark, target):
    """Same version, one tombstone: replaying a delete+reinsert batch must
    resolve the same way every run — deletes win ties."""
    src = spark.createDataFrame(
        [(2, "resurrect", 9.0, False, 5), (2, "kill", 0.0, True, 5)],
        SRC_SCHEMA + ", v int",
    )
    got = _rows(
        merge_upsert(target, src, ["k"], tombstone_col="dead", version_col="v")
    )
    assert not any(r[0] == 2 for r in got)


def test_replay_idempotent(spark, target):
    src = spark.createDataFrame(
        [(1, "u", 10.0, False), (6, "i", 60.0, False), (4, "z", 0.0, True)],
        SRC_SCHEMA,
    )
    once = merge_upsert(target, src, ["k"], tombstone_col="dead")
    twice = merge_upsert(once, src, ["k"], tombstone_col="dead")
    assert _rows(once) == _rows(twice)
    assert len(_rows(once)) == 4  # 4 - 1 deleted + 1 inserted


def test_multi_column_key(spark):
    t = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], "a long, b string, val double")
    s = spark.createDataFrame([(1, "y", 9.0), (2, "z", 5.0)], "a long, b string, val double")
    got = _rows(merge_upsert(t, s, ["a", "b"]))
    assert got == {(1, "x", 1.0), (1, "y", 9.0), (2, "z", 5.0)}


def test_contract_errors(spark, target):
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, target.select("k", "name"), ["k"])
    with pytest.raises(ValueError, match="at least one key"):
        merge_upsert(target, target, [])
    with pytest.raises(ValueError, match="collides"):
        merge_upsert(
            target,
            target.withColumn("name2", F.lit(True)),
            ["k"],
            tombstone_col="name",
        )


def test_q77_matches_oracle(spark, sf_dir, oracle):
    from mapreduce_paper_implementation_spark.plans.pipeline_queries import (
        q77_merge_upsert,
    )
    from mapreduce_paper_implementation_spark.plans.queries import ORACLES
    from mapreduce_paper_implementation_spark.testing.compare import compare_query

    res = compare_query(
        spark, oracle, "q77_merge_upsert", q77_merge_upsert,
        ORACLES["q77_merge_upsert"], sf_dir,
    )
    assert res.ok, res.detail


# ---------------------------------------------------------------------------
# snapshot_diff ∘ merge_upsert roundtrip law: the changeset DERIVED from two
# snapshots, APPLIED to the old one, reproduces the new one exactly — the
# algebraic contract connecting the CDC detection operator to the MERGE
# operator it feeds (q98 -> q77 pipeline).
# ---------------------------------------------------------------------------


def _apply_diff(spark, old, new):
    from mapreduce_paper_implementation_spark.operators.merge import snapshot_diff

    d = snapshot_diff(old, new, ["k"], ["v", "s"])
    changeset = d.select(
        "k",
        F.col("new_v").alias("v"),
        F.col("new_s").alias("s"),
        (F.col("change_type") == "DELETE").alias("dead"),
    )
    return merge_upsert(old, changeset, ["k"], tombstone_col="dead")


def test_diff_then_apply_roundtrips(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows = st.lists(
        st.tuples(
            st.integers(0, 9),
            st.integers(-3, 3),
            st.sampled_from(["a", "b", None]),
        ),
        max_size=12,
    )

    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(old_rows=rows, new_rows=rows)
    def run(old_rows, new_rows):
        # snapshots: one row per key (last write wins in the dict)
        old_d = {k: (v, s) for k, v, s in old_rows}
        new_d = {k: (v, s) for k, v, s in new_rows}
        schema = "k long, v long, s string"
        old = spark.createDataFrame(
            [(k, v, s) for k, (v, s) in old_d.items()] or [(99, 0, "x")], schema
        )
        new = spark.createDataFrame(
            [(k, v, s) for k, (v, s) in new_d.items()] or [(99, 0, "x")], schema
        )
        if not old_d:
            old = old.where("k < 0")
        if not new_d:
            new = new.where("k < 0")
        got = sorted(map(tuple, _apply_diff(spark, old, new).collect()))
        want = sorted((k, v, s) for k, (v, s) in new_d.items())
        assert got == want

    run()
