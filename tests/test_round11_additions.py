"""Round-11 pins: q119 (BPE corpus apply), q120 (rank-sketch bracket),
q121 (unigram-LM training) — the shape/determinism gates that complement
the driver's oracle diff and the hypothesis replays."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.plans.queries import QUERIES


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_q119_apply_is_map_only_with_broadcast_merges(spark):
    """The train->apply contract: applying a learned merge table to a word
    frame adds ZERO shuffle exchanges — the merge table collapses to one
    broadcast array row (BroadcastExchange + BroadcastNestedLoopJoin) and
    the fold is map-side."""
    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        bpe_apply_merges,
    )

    words = spark.createDataFrame(
        [("web", "abab", 3), ("wiki", "aab", 2)], "source string, w string, freq long"
    )
    merges = spark.createDataFrame(
        [(1, "a", "b", 5), (2, "ab", "ab", 2)],
        "rnd long, left_sym string, right_sym string, pair_cnt long",
    ).localCheckpoint()  # stands in for the trained table; apply plan only
    applied = bpe_apply_merges(words, merges, word_col="w")
    plan = applied._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" in plan and "BroadcastNestedLoopJoin" in plan, plan
    got = {r["w"]: list(r["subwords"]) for r in applied.collect()}
    assert got == {"abab": ["abab"], "aab": ["a", "ab"]}


def test_q120_bracket_holds(spark, sf_dir):
    """Every (event_type, phi) row's est_ok must be TRUE — the sketch's
    measured headroom is ~6x inside the 2% bracket, so a false here is a
    real accuracy regression, not noise."""
    out = QUERIES["q120_sketch_quantiles"](spark, sf_dir).collect()
    assert out and all(r["est_ok"] for r in out), [
        (r["event_type"], r["phi"]) for r in out if not r["est_ok"]
    ]


def test_q121_deterministic_across_runs(spark, sf_dir):
    """Pin the TRAINED PIECE TABLE's determinism + coverage + mass
    conservation directly on the operator (the q121 QUERY now returns the
    invariant readout — see test_q121_audit_booleans_hold — so the table
    pins moved here to the operator surface): two independent runs
    produce identical piece tables, single-character coverage is total,
    and counts conserve the freq-weighted piece mass of a Viterbi
    segmentation (every word's pieces concatenate to the word, so summed
    piece LENGTH x count mass equals total character mass of segmented
    words)."""
    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        unigram_train,
        word_freq,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    def run():
        return unigram_train(
            word_freq(load_table(spark, sf_dir, "documents")),
            vocab_size=200,
            max_len=4,
            em_rounds=2,
        ).orderBy("piece")

    a = _rows(run())
    b = _rows(run())
    assert a == b
    assert len(a) > 0
    chars = {p for p, _ in a if len(p) == 1}
    from mapreduce_paper_implementation_spark.operators.tokenizer import word_freq
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    wf = word_freq(load_table(spark, sf_dir, "documents"))
    corpus_chars = {
        r["c"]
        for r in wf.select(
            F.explode(F.split("w", "(?!^)(?=.)")).alias("c")
        ).collect()
    }
    assert corpus_chars <= chars  # single-char coverage survives the prune
    # mass conservation: sum(len(piece) * cnt) == total chars of all word
    # occurrences (each occurrence segmented exactly once in the last
    # round). Equality holds when the prune dropped nothing (table under
    # the vocab budget — true at the test SF); a pruned piece removes its
    # mass, so in general the table's mass is a lower bound.
    total_piece_chars = sum(len(p) * c for p, c in a)
    total_word_chars = wf.select(
        F.sum(F.length("w") * F.col("freq")).alias("s")
    ).collect()[0]["s"]
    if len(a) < 200:  # nothing pruned: q121's vocab_size budget unfilled
        assert total_piece_chars == total_word_chars
    else:
        assert total_piece_chars <= total_word_chars


def test_q124_cluster_split_invariants(spark, sf_dir):
    """q124's load-bearing invariants beyond the oracle hash: the
    cluster-granular rule leaks ZERO near-dup pairs in every split; doc
    counts partition the corpus; clusters never outnumber docs; and the
    doc-rule leak column obeys its structural parity — every straddling
    pair contributes one endpoint-count to EXACTLY two splits, so the
    total is even (an always-true `>= 0` here would be vacuous; evenness
    actually fails if the leak join ever double- or half-counts). The
    positive doc-rule contrast itself is pinned at sf0.01 by the q126
    fixture numbers (doc 4 docs/151 hits vs cluster 0/0), not here —
    at tiny SFs all pairs can legitimately land inside one split."""
    rows = QUERIES["q124_leakage_safe_split"](spark, sf_dir).collect()
    assert {r["split"] for r in rows} <= {"train", "valid", "test"}
    assert all(r["cluster_leak_pairs"] == 0 for r in rows)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(r["n_clusters"] <= r["n_docs"] for r in rows)
    assert sum(r["doc_leak_pairs"] for r in rows) % 2 == 0


def test_q124_plan_broadcasts_pair_set(spark, sf_dir):
    """The leak joins must broadcast the DERIVED near-dup pair set and
    stream the corpus-sized labeled map (the q109 discipline): at least
    one broadcast exchange, no cartesian fallback, and no Python boundary
    anywhere in the q124 plan."""
    df = QUERIES["q124_leakage_safe_split"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q125_rank_stripe_exactly_balanced(spark, sf_dir):
    """q125's load-bearing contrast: rank-striped shard doc counts differ by
    at most 1 (exact balance — the property hash sharding cannot give),
    every shard id 0..15 is present, and both rules partition the corpus."""
    rows = QUERIES["q125_shard_export"](spark, sf_dir).collect()
    assert sorted(r["shard"] for r in rows) == list(range(16))
    docs_rank = [r["n_docs_rank"] for r in rows]
    assert max(docs_rank) - min(docs_rank) <= 1
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(docs_rank) == n
    assert sum(r["n_docs_hash"] for r in rows) == n


def test_q125_plan_uses_range_partition_never_single_task_window(spark, sf_dir):
    """The rank side must be the TeraSort shape: a range exchange feeds the
    per-partition window; no WindowExec may consume the corpus in a single
    task (the §8.7 discipline — windows are either partitioned by the range
    pid or run over the n_partitions-row offsets frame)."""
    from mapreduce_paper_implementation_spark.testing.planwalk import iter_plan

    df = QUERIES["q125_shard_export"](spark, sf_dir)
    root = df._jdf.queryExecution().executedPlan()
    plan = root.toString()
    assert "rangepartitioning" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    windows = [
        n for n in iter_plan(root) if n.getClass().getSimpleName() == "WindowExec"
    ]
    assert windows, "expected the local-rank and offsets windows"
    for node in windows:
        head = node.toString().splitlines()[0]
        if "_pid" in head:
            continue  # the per-range-partition local rank — parallel
        # the only unpartitioned window allowed is the offsets prefix sum,
        # which must sit on the n_partitions-row counts AGGREGATE, never
        # on the data
        assert "HashAggregate" in node.toString(), head


def test_q123_deterministic_and_consistent_with_q122_shape(spark, sf_dir):
    """q123 (trained-table apply, invariant-oracle since round 12) must
    be run-to-run deterministic — the unigram trainer and greedy apply
    are pure functions of exact integer counts — with every invariant
    boolean TRUE, per-source word totals equal to q122's (the lift the
    round-11 verdict asked for, now also oracle-gated), and the full
    fertility readout still available through the operator surface.
    NOTE deliberately NOT asserted: a fertility ordering between trained
    and seed vocabularies. Greedy longest-match is not monotone under
    vocabulary subsetting (dropping a long piece can REROUTE a walk onto
    longer matches downstream: seed {aba,ab,abc} segments 'ababc' as
    aba|b|c but the subset {ab,abc} as ab|abc), so neither direction is
    an invariant."""
    a = QUERIES["q123_trained_segment"](spark, sf_dir).collect()
    b = QUERIES["q123_trained_segment"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    q122 = {r["source"]: r for r in QUERIES["q122_greedy_segment"](spark, sf_dir).collect()}
    assert {r["source"] for r in a} == set(q122)
    for r in a:
        assert r["n_words"] == q122[r["source"]]["n_words"]
        assert r["subwords_bracket_ok"] and r["pieces_in_vocab"]
        assert r["n_chars_total"] >= r["n_words"]


def test_q126_cluster_rule_never_leaks_more_than_doc_rule_on_planted(spark, sf_dir):
    """q126's demonstration, pinned on the fixture: the planted near-dups
    share long n-gram spans, so the cluster-granular split (which moves
    near-dup partners together) must show no MORE residual 8-gram
    contamination than the doc-granular rule, summed over eval splits —
    and the row grain/keys must be the 2-rule x 2-eval-split matrix."""
    rows = QUERIES["q126_residual_contamination"](spark, sf_dir).collect()
    assert {(r["rule"], r["split"]) for r in rows} == {
        ("cluster", "valid"), ("cluster", "test"), ("doc", "valid"), ("doc", "test"),
    }
    tot = {
        rule: sum(r["contaminated_docs"] for r in rows if r["rule"] == rule)
        for rule in ("cluster", "doc")
    }
    # FIXTURE-COUPLED (ADVICE r11): cluster <= doc is a property of the
    # PLANTED near-dups (they share long n-gram spans, so co-moving them
    # removes cross-split hits), not a mathematical invariant — cluster
    # assignment moves docs between splits in both directions. If this
    # fails right after a testdata regen, diagnose it as a fixture change
    # (re-pin the expectation), not as a q126 regression.
    assert tot["cluster"] <= tot["doc"], (
        f"fixture-coupled contrast broke: {tot} — if the testdata was "
        "regenerated, re-pin; otherwise investigate q126"
    )
