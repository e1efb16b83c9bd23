"""Differential gates for streaming/gram_index.py:GramIndexMaintainer — the
materialized twin of operators/text_analysis.py:crossdoc_repeated_grams
(q75). VERDICT r06 ask #1: per-batch output deltas (latest emission per doc)
must union to the one-shot batch answer BEFORE and AFTER compact(), the
retroactive repeat credit must actually fire, and replays must be no-ops.
"""

import os

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.text_analysis import (
    crossdoc_repeated_grams,
)
from mapreduce_paper_implementation_spark.sources.tables import load_table
from mapreduce_paper_implementation_spark.streaming.gram_index import (
    GramIndexMaintainer,
)

K = 6  # short grams -> plenty of cross-doc repeats in the 500-doc fixture


def _one_shot(docs, k=K):
    return {
        r["id"]: (r["n_grams"], r["n_repeated"], r["repeated_frac"])
        for r in crossdoc_repeated_grams(docs, k=k).collect()
    }


def _latest_per_doc(update_batches):
    """Replay the emitted deltas in batch order; the last write per doc is
    the maintainer's standing answer for it."""
    latest = {}
    for out in update_batches:
        for r in out.collect():
            latest[r["id"]] = (r["n_grams"], r["n_repeated"], r["repeated_frac"])
    return latest


def _current(m):
    return {
        r["id"]: (r["n_grams"], r["n_repeated"], r["repeated_frac"])
        for r in m.current().collect()
    }


def test_gram_index_updates_union_to_one_shot(spark, sf_dir, tmp_path):
    """3 ingest batches over the documents fixture: latest-emission-per-doc
    across the batch deltas == one-shot crossdoc_repeated_grams over the
    union, and current() agrees — the q75 differential contract."""
    docs = load_table(spark, sf_dir, "documents")
    m = GramIndexMaintainer(spark, str(tmp_path / "state"), k=K)

    outs = [m.update(docs.where(F.col("doc_id") % 3 == b), b) for b in range(3)]
    expected = _one_shot(docs)
    assert _latest_per_doc(outs) == expected
    assert _current(m) == expected


def test_gram_index_retroactive_credit_fires(spark, tmp_path):
    """A gram posted uniquely in batch 0 becomes repeated when batch 1
    re-posts it: batch 1's delta must RE-EMIT the corrected batch-0 row."""
    boiler = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, boiler + " india one"),
        (2, "nov osc papa quebec romeo sierra tango uniform victor whiskey"),
    ]
    later = [(3, boiler + " xray two")]
    schema = "doc_id long, text string"
    m = GramIndexMaintainer(spark, str(tmp_path / "state"), k=4)

    out0 = m.update(spark.createDataFrame(rows, schema), 0)
    by_id0 = {r["id"]: r for r in out0.collect()}
    assert by_id0[1]["n_repeated"] == 0  # nothing repeated yet

    out1 = m.update(spark.createDataFrame(later, schema), 1)
    by_id1 = {r["id"]: r for r in out1.collect()}
    # batch 1 contains doc 3 AND the retroactive correction for doc 1;
    # the untouched doc 2 must NOT be re-emitted (delta contract).
    assert set(by_id1) == {1, 3}
    # docs 1 and 3 share the 5 k=4 grams of the 8-token boilerplate prefix.
    assert by_id1[1]["n_repeated"] == 5
    assert by_id1[3]["n_repeated"] == 5

    all_docs = spark.createDataFrame(rows + later, schema)
    assert _current(m) == _one_shot(all_docs, k=4)


def test_gram_index_compact_preserves_and_truncates(spark, sf_dir, tmp_path):
    """compact() folds the chain to one baseline generation: current() is
    unchanged, a later batch still gets retroactive credits against the
    compacted state, and the final answer still equals one-shot."""
    docs = load_table(spark, sf_dir, "documents")
    m = GramIndexMaintainer(spark, str(tmp_path / "state"), k=K)

    outs = [m.update(docs.where(F.col("doc_id") % 3 == b), b) for b in range(2)]
    first_two = docs.where(F.col("doc_id") % 3 < 2)
    before = _current(m)
    assert m.compact() == 1
    assert _current(m) == before == _one_shot(first_two)
    # chain truncated: no delta dirs remain, one baseline generation.
    assert os.listdir(os.path.join(str(tmp_path / "state"), "batches")) == []
    assert len(os.listdir(os.path.join(str(tmp_path / "state"), "baseline"))) == 1
    # compact again: idempotent no-op.
    assert m.compact() == 1

    outs.append(m.update(docs.where(F.col("doc_id") % 3 == 2), 2))
    expected = _one_shot(docs)
    assert _latest_per_doc(outs) == expected
    assert _current(m) == expected


def test_gram_index_replay_is_noop(spark, sf_dir, tmp_path):
    """A batch id at or below the committed pointer returns None and leaves
    both the state and the stored update delta untouched."""
    docs = load_table(spark, sf_dir, "documents")
    m = GramIndexMaintainer(spark, str(tmp_path / "state"), k=K)
    for b in range(2):
        m.update(docs.where(F.col("doc_id") % 3 == b), b)
    before = _current(m)
    stored = {r["id"] for r in m.updates(1).collect()}
    assert m.update(docs.where(F.col("doc_id") % 3 == 1), 1) is None
    assert m.update(docs.where(F.col("doc_id") % 3 == 0), 0) is None
    assert _current(m) == before
    assert {r["id"] for r in m.updates(1).collect()} == stored
