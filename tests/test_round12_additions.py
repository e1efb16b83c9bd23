"""Round-12 additions (VERDICT r11 asks):

- q126 hashed-gram shuffle: the corpus-scale inverted-index join moves the
  fixed-width xxhash64 of the 8-gram; the gram TEXT never crosses an
  exchange (plan pin). The DuckDB oracle keeps joining on text, so the
  value-hash gate is also the collision audit.
- q124/q126 release-cut default: with SPARK_GRAFT_CC_CUT pointing at a
  materialized (id, component) parquet label map, both queries read it
  instead of rebuilding the pair graph + CC inline — results bit-identical.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.plans.queries import QUERIES
from mapreduce_paper_implementation_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_q124_q126_release_cut_equals_inline_and_plan_pin(spark, sf_dir, tmp_path):
    """Two gates in one pass over the release-cut configuration:

    (a) equality — publishing the (id, component) label map as a release
        cut (SPARK_GRAFT_CC_CUT) yields bit-identical q124/q126 results
        to the inline pair-graph + CC rebuild;
    (b) plan pin (VERDICT r11 #1) — in the PRODUCTION shape (labels from
        the cut, so the audit join is the only corpus-scale shuffle), no
        Exchange carries the 8-gram shingle STRING: the shuffle key is
        the fixed-width xxhash64. (The inline fallback's pair-graph build
        self-joins on 3-gram text internally — the q20 family — which is
        why the pin targets the cut configuration.)"""
    from mapreduce_paper_implementation_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from mapreduce_paper_implementation_spark.operators.graph import (
        connected_components,
    )

    assert "SPARK_GRAFT_CC_CUT" not in os.environ
    docs = load_table(spark, sf_dir, "documents")
    inline_124 = _rows(QUERIES["q124_leakage_safe_split"](spark, sf_dir))
    inline_126 = _rows(QUERIES["q126_residual_contamination"](spark, sf_dir))

    cut_dir = str(tmp_path / "cc_cut")
    connected_components(
        ngram_jaccard_pairs(docs, threshold=0.1)
    ).write.mode("overwrite").parquet(cut_dir)

    os.environ["SPARK_GRAFT_CC_CUT"] = cut_dir
    try:
        df = QUERIES["q126_residual_contamination"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "shingle" not in line, line
        assert "xxhash64" in df._jdf.queryExecution().optimizedPlan().toString()
        assert _rows(df) == inline_126
        assert _rows(QUERIES["q124_leakage_safe_split"](spark, sf_dir)) == inline_124
    finally:
        del os.environ["SPARK_GRAFT_CC_CUT"]


def test_q121_audit_booleans_hold(spark, sf_dir):
    """q121's invariant readout (the round-12 rows-only -> oracle flip):
    one row, every pinned boolean TRUE, exact anchors positive. A FALSE
    here is a real training-loop regression (lost E-step mass, coverage
    hole, prune overrun), not noise."""
    rows = QUERIES["q121_unigram_train"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["chars_covered"] and r["n_pieces_ok"] and r["mass_conserved"]
    assert r["multi_pieces_positive"]
    assert r["n_word_types"] > 0 and r["n_chars"] > 0
    assert r["total_freq"] >= r["n_word_types"]


def test_q125_left_join_keeps_empty_hash_shards(spark):
    """ADVICE r11: an md5 hash shard can be empty at small corpora; the
    rank-stripe row for that shard id must survive (left join + zero
    fill), not vanish through an inner join. Probe the operator shape
    directly: with 1 doc and 16 shards, exactly one hash shard is
    populated but all rank stripes with rows must still appear."""
    import duckdb

    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        _q125_oracle,
    )

    # the oracle itself must be left-joined: run it over a 1-row corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, "
        "'alpha beta gamma' AS text, 16::BIGINT AS n_chars, "
        "'s' AS source, 0::BIGINT AS lang_hint"
    )
    rows = con.execute(_q125_oracle()).fetchall()
    con.close()
    # one doc -> one rank stripe row; its hash columns must be 0-filled
    # when the doc's hash shard differs from its stripe shard, never NULL
    assert len(rows) == 1
    assert all(v is not None for r in rows for v in r)
