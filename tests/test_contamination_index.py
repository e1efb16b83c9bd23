"""Differential gates for streaming/contamination_index.py (VERDICT r11
stretch #8): the maintained residual cross-split contamination audit must
equal the one-shot recompute after EVERY batch, re-emit retroactively when
a late train doc newly contaminates an already-served eval doc, and be
replay- and compaction-invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.functions.text import word_shingles
from mapreduce_paper_implementation_spark.operators.serving import split_of
from mapreduce_paper_implementation_spark.sources.tables import load_table
from mapreduce_paper_implementation_spark.streaming.contamination_index import (
    ContaminationIndexMaintainer,
)


def _one_shot(docs, split_fn, n=8):
    """The batch truth: per eval-side doc, how many of its distinct
    n-grams the train side holds — same hashed-key pipeline as the
    maintainer and q126."""
    grams = docs.select(
        F.col("doc_id").alias("id"),
        split_fn(F.col("doc_id")).alias("split"),
        F.explode(word_shingles("text", n)).alias("shingle"),
    ).select("id", "split", F.xxhash64("shingle").alias("gh"))
    train = grams.where(F.col("split") == "train").select("gh").distinct()
    return (
        grams.where(F.col("split") != "train")
        .join(train.withColumn("_t", F.lit(1)), "gh", "left")
        .groupBy("id", "split")
        .agg(
            F.sum(F.when(F.col("_t").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("hits")
        )
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_matches_one_shot_after_every_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m = ContaminationIndexMaintainer(spark, str(tmp_path / "state"))
    bounds = [(0, 170), (170, 340), (340, 10**9)]
    seen = None
    for i, (lo, hi) in enumerate(bounds, start=1):
        batch = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        assert m.update(batch, i) is not None
        seen = batch if seen is None else seen.unionByName(batch)
        assert _rows(m.current()) == _rows(_one_shot(seen, split_of))
    # latest-emission-per-doc reconstruction equals the materialized view
    updates = None
    for i in range(1, len(bounds) + 1):
        u = m.updates(i).withColumn("_b", F.lit(i))
        updates = u if updates is None else updates.unionByName(u)
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("_b"))
    latest = (
        updates.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("id", "split", "hits")
    )
    assert _rows(latest) == _rows(m.current())


@pytest.fixture()
def parity_split():
    """Controllable split: even ids train, odd ids eval."""
    return lambda c: F.when(c % 2 == 0, F.lit("train")).otherwise(F.lit("valid"))


def test_retroactive_reemission(spark, tmp_path, parity_split):
    """A TRAIN doc arriving after an eval doc with a shared 8-gram must
    re-emit the PRIOR eval doc with its corrected hit count — the
    gram_index retroactive-credit case at the split boundary."""
    m = ContaminationIndexMaintainer(
        spark, str(tmp_path / "state"), split_fn=parity_split
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    # batch 1: eval doc 1 holds the gram; no train docs yet -> hits 0
    u1 = m.update(mk([(1, shared)]), 1)
    assert _rows(u1) == [(1, "valid", 0)]
    # batch 2: unrelated train doc -> no crossing, no re-emission
    u2 = m.update(mk([(2, "one two three four five six seven eight")]), 2)
    assert _rows(u2) == []
    # batch 3: train doc 4 posts the shared gram for the FIRST time ->
    # doc 1 must be re-emitted with hits 1
    u3 = m.update(mk([(4, shared)]), 3)
    assert (1, "valid", 1) in _rows(u3)
    assert _rows(m.current()) == [(1, "valid", 1)]
    # batch 4: ANOTHER train doc with the same gram: already train-present,
    # no new information -> no re-emission of doc 1
    u4 = m.update(mk([(6, shared)]), 4)
    assert _rows(u4) == []


def test_replay_noop_and_compact_invariance(spark, tmp_path, parity_split):
    m = ContaminationIndexMaintainer(
        spark, str(tmp_path / "state"), split_fn=parity_split
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    m.update(mk([(1, shared)]), 1)
    m.update(mk([(4, shared)]), 2)
    before = _rows(m.current())
    # replay of a committed batch is a no-op
    assert m.update(mk([(4, shared)]), 2) is None
    assert _rows(m.current()) == before
    # compaction folds the chain without changing the view, and ingest
    # continues on top of the baseline
    assert m.compact() == 2
    assert _rows(m.current()) == before
    u = m.update(mk([(3, shared)]), 3)
    assert _rows(u) == [(3, "valid", 1)]
    assert _rows(m.current()) == sorted(before + [(3, "valid", 1)])
