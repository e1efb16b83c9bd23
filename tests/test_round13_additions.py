"""Round-13 regression gates for the ADVICE fixes:

- global_rank no longer rides on the cache: ranks stay correct even when
  every registered persist is released BEFORE the derived frame is
  materialized (the exact sequence that would have re-sampled the range
  boundaries under the round-12 scoped_persist pin).
- SPARK_GRAFT_CC_CUT set-but-missing RAISES instead of silently flipping
  the label source to the inline rebuild, and q124 gates on the same
  resolver.
- ContaminationIndexMaintainer.update distinguishes a replay of an
  ingested batch (no-op) from a never-seen batch id at or below the
  pointer (raise) — the silent-drop hole.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.plans.queries import QUERIES


def test_global_rank_survives_cache_release(spark):
    """caching.py's contract: 'correctness never depends on the cache'.
    Build a ranked frame, release EVERY registered persist before any
    action, then materialize — every rank must still appear exactly once
    (under the round-12 persist pin, this sequence could re-evaluate
    repartitionByRange as two shuffles with different sampled boundaries
    and emit duplicate/missing ranks near each boundary)."""
    from mapreduce_paper_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_paper_implementation_spark.operators.sort import global_rank

    n = 50_000
    df = spark.range(n).select(
        (F.xxhash64(F.col("id").cast("string")) % 1000).alias("k"), "id"
    )
    ranked = global_rank(df, [F.col("k"), F.col("id")], n_partitions=16)
    release_persisted()  # BEFORE materialization — the dangerous sequence
    spark.catalog.clearCache()
    got = sorted(r["rank"] for r in ranked.select("rank").collect())
    assert got == list(range(1, n + 1))


def test_cc_cut_set_but_missing_raises(spark, sf_dir, tmp_path):
    """A typo'd/stale SPARK_GRAFT_CC_CUT must fail loudly, not silently
    rebuild labels inline (round-13 ADVICE fix) — for both the
    _split_labels consumer (via q126) and q124's own gate."""
    assert "SPARK_GRAFT_CC_CUT" not in os.environ
    os.environ["SPARK_GRAFT_CC_CUT"] = str(tmp_path / "no_such_dir")
    try:
        with pytest.raises(FileNotFoundError, match="SPARK_GRAFT_CC_CUT"):
            QUERIES["q126_residual_contamination"](spark, sf_dir)
        with pytest.raises(FileNotFoundError, match="SPARK_GRAFT_CC_CUT"):
            QUERIES["q124_leakage_safe_split"](spark, sf_dir)
    finally:
        del os.environ["SPARK_GRAFT_CC_CUT"]


def test_ann_release_index_equals_inline(spark, sf_dir, tmp_path):
    """VERDICT r12 ask #1: publishing the trained ANN artifacts (coarse
    centroids, PQ codebooks, corpus cells, corpus codes) behind
    $SPARK_GRAFT_ANN_INDEX and reading them at query time must yield
    BIT-IDENTICAL q118/q116/q127 results to the inline retraining — the
    determinism contract of kmeans_fit/pq_train makes the artifacts equal,
    this pins that the plumbing preserves it. Also: set-but-unpublished
    raises (the _cc_cut_dir contract)."""
    from mapreduce_paper_implementation_spark.operators.ann_release import (
        publish_ann_index,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    assert "SPARK_GRAFT_ANN_INDEX" not in os.environ

    def _rows(name):
        return sorted(tuple(r) for r in QUERIES[name](spark, sf_dir).collect())

    inline = {n: _rows(n) for n in (
        "q118_ann_ivf_pq", "q116_semantic_decontaminate", "q127_release_cut"
    )}

    os.environ["SPARK_GRAFT_ANN_INDEX"] = str(tmp_path / "unpublished")
    try:
        with pytest.raises(FileNotFoundError, match="SPARK_GRAFT_ANN_INDEX"):
            QUERIES["q118_ann_ivf_pq"](spark, sf_dir)
    finally:
        del os.environ["SPARK_GRAFT_ANN_INDEX"]

    idx_dir = str(tmp_path / "ann_index")
    emb = load_table(spark, sf_dir, "embeddings")
    assert publish_ann_index(emb, idx_dir) == 1
    os.environ["SPARK_GRAFT_ANN_INDEX"] = idx_dir
    try:
        for name, want in inline.items():
            assert _rows(name) == want, name
    finally:
        del os.environ["SPARK_GRAFT_ANN_INDEX"]


def test_ann_indexed_q118_plan_has_no_training(spark, sf_dir, tmp_path):
    """In the production (published-index) shape, q118's job must contain
    NO k-means fit and NO corpus encode: building the plan triggers only
    the handful of parquet listing/schema jobs for the index leaves —
    never the dozens of driver-blocking Lloyd-iteration jobs inline
    kmeans_fit/pq_train run at plan-build time — and the index leaves
    appear as scan relations."""
    from mapreduce_paper_implementation_spark.operators.ann_release import (
        publish_ann_index,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    idx_dir = str(tmp_path / "ann_index")
    publish_ann_index(load_table(spark, sf_dir, "embeddings"), idx_dir)
    os.environ["SPARK_GRAFT_ANN_INDEX"] = idx_dir
    try:
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup() or [])
        df = QUERIES["q118_ann_ivf_pq"](spark, sf_dir)
        after = len(tracker.getJobIdsForGroup() or [])
        # 4 leaf reads -> a few listing/schema jobs; a Lloyd fit would add
        # dozens (>= 3 jobs x 2 iterations x (1 coarse + 8 PQ subspaces))
        assert after - before <= 6, (
            f"indexed q118 plan build ran {after - before} Spark jobs — "
            "more than parquet listing can explain (inline training?)"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ann_index" in plan  # the index parquet leaves are scanned
    finally:
        del os.environ["SPARK_GRAFT_ANN_INDEX"]


def test_release_export_roundtrip_manifest_and_atomicity(spark, sf_dir, tmp_path):
    """VERDICT r12 ask #2 gates, all in one pass over one export:

    (a) re-read equality — exported rows == the release_cut_frames perdoc
        assignment (with payload columns joined);
    (b) manifest == ledger — the manifest's per-(split, shard) counts
        equal q127's hash-gated aggregate rows, and its ledger equals the
        scrub ledger;
    (c) atomic versioning — a second export bumps the version; a torn
        write (version dir present, pointer not moved) stays INVISIBLE to
        readers."""
    import json as _json

    from mapreduce_paper_implementation_spark.plans.release_queries import (
        release_cut_frames,
    )
    from mapreduce_paper_implementation_spark.sources.release_export import (
        export_release,
        read_release,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    out = str(tmp_path / "release")
    perdoc, ledger = release_cut_frames(spark, sf_dir)
    payload = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    assert export_release(perdoc, ledger, out, payload=payload) == 1

    got, manifest = read_release(spark, out)
    # (a) re-read equality, payload included
    want = sorted(
        tuple(r)
        for r in perdoc.join(payload, "doc_id")
        .select("doc_id", "tc", "split", "shard", "source", "text")
        .collect()
    )
    assert (
        sorted(
            tuple(r)
            for r in got.select(
                "doc_id", "tc", "split", "shard", "source", "text"
            ).collect()
        )
        == want
    )
    # (b) manifest counts == the q127 aggregate; manifest ledger == ledger
    q127 = QUERIES["q127_release_cut"](spark, sf_dir).collect()
    agg = {
        (r["split"], r["shard"]): (r["n_docs"], r["n_tokens"]) for r in q127
    }
    assert {
        (c["split"], c["shard"]): (c["n_docs"], c["n_tokens"])
        for c in manifest["shards"]
    } == agg
    led = ledger.collect()[0].asDict()
    assert manifest["ledger"] == {k: int(v) for k, v in led.items()}
    assert manifest["totals"]["n_docs"] == sum(v[0] for v in agg.values())
    # (c) versioning + torn-write invisibility
    assert export_release(perdoc, ledger, out, payload=payload) == 2
    torn = tmp_path / "release" / "v0000000003"
    torn.mkdir()
    (torn / "manifest.json").write_text(_json.dumps({"version": 3}))
    _, m = read_release(spark, out)
    assert m["version"] == 2  # pointer never moved; v3 is invisible


def test_q130_planted_repertoire_visible(spark, sf_dir):
    """The multilingual unigram seed-apply (q130) must SHOW the planted
    CJK/Greek/Cyrillic segmentation in its hash-gated output: the
    source='planted' row exists and its top subwords are non-ASCII."""
    rows = {r["source"]: r for r in QUERIES["q130_unicode_greedy_segment"](spark, sf_dir).collect()}
    assert "planted" in rows
    top = rows["planted"]["top_subwords"]
    assert top and any(ord(c) > 127 for c in top), top
    assert rows["planted"]["n_words"] > 0


def test_unicode_trained_segment_matches_python_replay(spark, sf_dir):
    """The q131 trained-apply differential (VERDICT r12 ask #6): segment
    the UNICODE union corpus's word types under an EM-trained unigram
    table and replay the greedy walk in pure Python — the gate the DuckDB
    oracle cannot provide for the trained table, extended past ASCII
    (planted CJK/Greek/Cyrillic word types included)."""
    from test_greedy_segment import _py_greedy

    from mapreduce_paper_implementation_spark.functions.text import tokens_unicode
    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        greedy_segment,
        unigram_train,
    )
    from mapreduce_paper_implementation_spark.plans.tokenizer_queries import (
        _unicode_corpus,
    )

    corpus = _unicode_corpus(spark, sf_dir)
    # keep every planted doc (negative ids) plus a corpus slice for speed
    corpus = corpus.where((F.col("doc_id") < 0) | (F.col("doc_id") < 200))
    wc = (
        corpus.select(F.explode(tokens_unicode("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .localCheckpoint()
    )
    trained = unigram_train(wc, vocab_size=80, max_len=4, em_rounds=1)
    vocab = {r["piece"] for r in trained.collect()}
    assert any(ord(c) > 127 for p in vocab for c in p)  # repertoire present
    got = {
        r["w"]: list(r["subwords"])
        for r in greedy_segment(
            wc.select("w"), trained.select("piece"), max_len=4
        ).collect()
    }
    words = [r["w"] for r in wc.select("w").collect()]
    assert set(got) == set(words)
    non_ascii = 0
    for w in words:
        assert got[w] == _py_greedy(w, vocab, 4), w
        non_ascii += any(ord(c) > 127 for c in w)
    assert non_ascii >= 10  # the planted repertoire actually exercised


def test_release_cut_view_equals_one_shot_after_every_batch(spark, sf_dir, tmp_path):
    """VERDICT r12 stretch #7: the incremental release-cut view (composed
    from maintained label/gram/cell/meta state) must equal the one-shot
    q127 over the seen corpus after EVERY ingest batch — the
    BENCH_INGEST.topology claim at the release grain. Both sides run under
    the same published ANN index so the frozen centroid geometry matches."""
    from mapreduce_paper_implementation_spark.operators.ann_release import (
        load_ann_index,
        publish_ann_index,
    )
    from mapreduce_paper_implementation_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from mapreduce_paper_implementation_spark.plans.release_queries import (
        release_cut_frames,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table
    from mapreduce_paper_implementation_spark.streaming.release_view import (
        ReleaseCutView,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    idx_dir = str(tmp_path / "ann_index")
    publish_ann_index(emb, idx_dir)
    centroids = load_ann_index(spark, idx_dir)["centroids"]

    view = ReleaseCutView(spark, str(tmp_path / "state"), centroids)

    def one_shot(seen_docs, seen_emb):
        perdoc, ledger = release_cut_frames(
            spark, sf_dir, docs=seen_docs, emb=seen_emb
        )
        pershard = perdoc.groupBy("split", "shard").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tc").cast("long").alias("n_tokens"),
        )
        return sorted(
            (r["split"], r["shard"], r["n_docs"], r["n_tokens"])
            for r in pershard.collect()
        ) + [tuple(ledger.collect()[0])]

    os.environ["SPARK_GRAFT_ANN_INDEX"] = idx_dir
    prev_pairs: set = set()
    bounds = [(0, 170), (170, 340), (340, 10**9)]
    try:
        for i, (lo, hi) in enumerate(bounds, start=1):
            in_batch = (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            seen_docs = docs.where(F.col("doc_id") < hi)
            seen_emb = emb.where(F.col("vec_id") < hi)
            # the batch's exact near-dup pair DELTA (pairwise jaccard is
            # corpus-independent, so pairs(seen) only ever grows;
            # production uses dedup_index's per-batch output instead)
            all_pairs = {
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in ngram_jaccard_pairs(seen_docs, threshold=0.1).collect()
            }
            delta = spark.createDataFrame(
                sorted(all_pairs - prev_pairs) or [(int(-1), int(-1), 0.0)],
                "id_a long, id_b long, jaccard double",
            )
            if not (all_pairs - prev_pairs):
                delta = delta.where(F.col("id_a") >= 0)  # empty delta frame
            prev_pairs = all_pairs
            view.update(
                docs.where(in_batch),
                emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
                delta,
                i,
            )
            got = view.current()
            got_rows = sorted(
                (r["split"], r["shard"], r["n_docs"], r["n_tokens"])
                for r in got.collect()
            )
            want = one_shot(seen_docs, seen_emb)
            assert got_rows == want[:-1], f"batch {i}: shards diverge"
            led = got.where(F.col("split") == "train").collect()[0]
            want_led = want[-1]
            assert (
                led["n_scrubbed_lex"],
                led["n_scrubbed_sem"],
                led["n_scrubbed_total"],
                led["n_quality_dropped"],
            ) == want_led, f"batch {i}: ledger diverges"

        # maintain -> cut -> EXPORT: the shard artifact written straight
        # off the view equals the one written from a fresh corpus parse
        from mapreduce_paper_implementation_spark.sources.release_export import (
            export_release,
            read_release,
        )

        v_perdoc, v_ledger = view.frames()
        export_release(v_perdoc, v_ledger, str(tmp_path / "rel_view"))
        o_perdoc, o_ledger = release_cut_frames(spark, sf_dir)
        export_release(o_perdoc, o_ledger, str(tmp_path / "rel_one"))
        dv, mv = read_release(spark, str(tmp_path / "rel_view"))
        do, mo = read_release(spark, str(tmp_path / "rel_one"))
        assert sorted(map(tuple, dv.collect())) == sorted(map(tuple, do.collect()))
        mv.pop("version"); mo.pop("version")
        assert mv == mo
    finally:
        del os.environ["SPARK_GRAFT_ANN_INDEX"]


def test_prefix_sum_matches_python_and_survives_cache_release(spark):
    """The parallel-scan primitive (operators/sort.py:prefix_sum): the
    exclusive prefix sum under a total order must equal the sequential
    replay, including after every registered persist is released before
    materialization (the global_rank cache-contract discipline)."""
    from mapreduce_paper_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_paper_implementation_spark.operators.sort import prefix_sum

    n = 20_000
    df = spark.range(n).select(
        (F.xxhash64(F.col("id").cast("string")) % 997).alias("k"),
        "id",
        ((F.col("id") * 7) % 13 + 1).alias("v"),
    )
    out = prefix_sum(df, [F.col("k"), F.col("id")], "v", out_col="cumb")
    release_persisted()
    spark.catalog.clearCache()
    rows = sorted(
        ((r["k"], r["id"], r["v"], r["cumb"]) for r in out.collect()),
        key=lambda t: (t[0], t[1]),
    )
    run = 0
    for k, i, v, cumb in rows:
        assert cumb == run, (k, i, cumb, run)
        run += v
    assert run == sum(r[2] for r in rows)


def test_q132_token_balance_property(spark, sf_dir):
    """Token-balanced shards: every shard's token mass deviates from the
    equal-share target by less than one boundary document on each side —
    spread(n_tokens) <= 2 * max(tc) — and every doc lands in exactly one
    shard (docs/tokens conserved vs the corpus)."""
    from mapreduce_paper_implementation_spark.functions.text import token_count
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(
        F.count("*").alias("n"),
        F.sum(token_count("text")).alias("tot"),
        F.max(token_count("text")).alias("max_tc"),
    ).collect()[0]
    rows = QUERIES["q132_token_balanced_shards"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == stats["n"]
    assert sum(r["n_tokens"] for r in rows) == stats["tot"]
    toks = [r["n_tokens"] for r in rows]
    assert max(toks) - min(toks) <= 2 * stats["max_tc"], (
        max(toks), min(toks), stats["max_tc"]
    )


def test_q133_water_filling_properties(spark, sf_dir):
    """The mixture planner's water-filling invariants: allocations respect
    caps; when any source is unsaturated the budget is spent EXACTLY and
    unsaturated allocations are level (differ by <= 1 token — the
    largest-remainder grant); saturated sources sit at their cap and
    below the water level."""
    rows = QUERIES["q133_mixture_allocation"](spark, sf_dir).collect()
    assert len(rows) > 1
    total = sum(r["n_tokens"] for r in rows)
    budget = total * 5 // 4
    assert all(r["allocated"] <= r["cap"] for r in rows)
    unsat = [r["allocated"] for r in rows if not r["saturated"]]
    sat = [r for r in rows if r["saturated"]]
    assert unsat, "fixture should leave some sources unsaturated"
    assert sat, "fixture should saturate the 1-epoch sources"
    assert sum(r["allocated"] for r in rows) == budget
    assert max(unsat) - min(unsat) <= 1
    # every saturated cap sits at/below the water level
    assert all(r["allocated"] == r["cap"] and r["cap"] <= max(unsat) for r in sat)


def test_q134_budget_consumption_bounds(spark, sf_dir):
    """The budgeted sample's greedy-inclusive head invariant: per source,
    tokens kept cover the allocation exactly up to ONE straddling document
    — 0 <= n_tokens_kept - allocated < max(doc tc) — and q133/q134 agree
    on the allocation column."""
    from pyspark.sql import functions as SF

    from mapreduce_paper_implementation_spark.functions.text import token_count
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    max_tc = {
        r["source"]: r["m"]
        for r in docs.groupBy("source")
        .agg(SF.max(token_count("text")).alias("m"))
        .collect()
    }
    alloc = {
        r["source"]: r["allocated"]
        for r in QUERIES["q133_mixture_allocation"](spark, sf_dir).collect()
    }
    rows = QUERIES["q134_budgeted_sample"](spark, sf_dir).collect()
    assert {r["source"] for r in rows} == set(alloc)
    for r in rows:
        assert r["allocated"] == alloc[r["source"]], r["source"]
        over = r["n_tokens_kept"] - r["allocated"]
        assert 0 <= over < max_tc[r["source"]], (r["source"], over)
        assert r["utilization"] >= 1.0


def test_contamination_index_never_seen_low_batch_id_raises(spark, tmp_path):
    """Replay of an INGESTED batch id stays a no-op (idempotence), but a
    batch id at or below the pointer that was never ingested — the
    out-of-order-after-a-skip case that used to silently drop the batch's
    docs — now raises."""
    from mapreduce_paper_implementation_spark.streaming.contamination_index import (
        ContaminationIndexMaintainer,
    )

    split = lambda c: F.when(c % 2 == 0, F.lit("train")).otherwise(  # noqa: E731
        F.lit("valid")
    )
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta iota kappa d{i}") for i in range(6)],
        "doc_id long, text string",
    )
    m = ContaminationIndexMaintainer(spark, str(tmp_path / "state"), split_fn=split)
    assert m.update(docs.where(F.col("doc_id") < 3), 1) is not None
    assert m.update(docs.where(F.col("doc_id") >= 3), 3) is not None  # skip id 2
    # replay of ingested ids: no-op, state untouched
    assert m.update(docs.where(F.col("doc_id") < 3), 1) is None
    assert m.update(docs.where(F.col("doc_id") >= 3), 3) is None
    # never-seen id 2 at/below the pointer: loud failure, not a silent drop
    with pytest.raises(ValueError, match="never ingested"):
        m.update(docs.where(F.col("doc_id") < 3), 2)
