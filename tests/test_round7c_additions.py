"""Round-7 third tranche (q102-q109): bfs_hops unit semantics + plan shapes
for the new curation queries. Oracle hash-matching is covered by the
parameterized tests/test_queries.py::test_query_matches_oracle (all register
DuckDB oracles — q102's is the WITH RECURSIVE bounded-path truth
formulation); bfs_hops is additionally property-tested against pure-Python
BFS in tests/test_properties.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.graph import bfs_hops
from mapreduce_paper_implementation_spark.plans.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _bfs(spark, edges, seeds, max_hops):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    rows = bfs_hops(e, s, max_hops=max_hops).collect()
    return {r["node"]: r["hop"] for r in rows}


def test_bfs_hops_chain_and_bound(spark):
    # 1->2->3->4->5: hop bound 3 must stop the wave at node 4.
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _bfs(spark, edges, [1], 3) == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_hops_min_over_multiple_paths(spark):
    # two routes to 4 (len 3 via 2-3, len 1 direct): BFS reports the min,
    # and the visited anti-join must not block the shorter discovery.
    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert _bfs(spark, edges, [1], 4) == {1: 0, 2: 1, 3: 2, 4: 1}


def test_bfs_hops_multi_seed_and_disconnected(spark):
    # disconnected component {9,10} unreachable; two seeds race: node 3 is
    # hop 1 from seed 5, not hop 2 from seed 1.
    edges = [(1, 2), (2, 3), (5, 3), (9, 10)]
    assert _bfs(spark, edges, [1, 5], 4) == {1: 0, 5: 0, 2: 1, 3: 1}


def test_bfs_hops_cycle_terminates(spark):
    # a cycle must not loop: visited-set anti-join ends the frontier early.
    edges = [(1, 2), (2, 3), (3, 1)]
    assert _bfs(spark, edges, [1], 10) == {1: 0, 2: 1, 3: 2}


def test_q102_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q102_bfs_reachability")
    assert "CartesianProduct" not in plan


def test_q103_histogram_selection_not_a_doc_sort(spark, sf_dir):
    # the exact per-source quantile must ride the bounded (source, score)
    # histogram: no per-doc row_number/rank window anywhere in the plan,
    # and the threshold comes back to the corpus via broadcast.
    plan = _plan(spark, sf_dir, "q103_adaptive_quality")
    assert "row_number" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q104_two_stage_partial_agg(spark, sf_dir):
    # event log -> per-user flags -> single row: both aggregates must have
    # a map-side partial phase, and nothing joins.
    plan = _plan(spark, sf_dir, "q104_ab_test")
    assert "partial" in plan.lower()
    assert "Join" not in plan


def test_q104_rates_well_formed(spark, sf_dir):
    row = QUERIES["q104_ab_test"](spark, sf_dir).collect()[0]
    assert row["n_a"] > 0 and row["n_b"] > 0
    assert 0.0 <= row["rate_a"] <= 1.0 and 0.0 <= row["rate_b"] <= 1.0
    # share-threshold conversion keeps both populations mixed at this sf,
    # so the pooled-variance guard must NOT have fired.
    assert row["z_score"] is not None


def test_containment_catches_what_jaccard_misses(spark):
    # a short doc quoted wholesale inside a long one: containment 1.0 but
    # Jaccard far below any dedup threshold — the asymmetric signal q105
    # exists for.
    from mapreduce_paper_implementation_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long_doc = filler + " " + short + " " + " ".join(f"z{i} q{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long_doc)], "doc_id long, text string"
    )
    cont = ngram_containment_pairs(docs, threshold=0.5).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == []


def test_q105_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q105_containment_neardup")
    assert "CartesianProduct" not in plan


def test_q106_model_joins_broadcast(spark, sf_dir):
    # the O(#types^2) transition model must broadcast onto the per-user
    # bigram counts — never reshuffle the big side by bigram.
    plan = _plan(spark, sf_dir, "q106_transition_perplexity")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q106_every_user_scored_and_positive(spark, sf_dir):
    rows = QUERIES["q106_transition_perplexity"](spark, sf_dir).collect()
    assert all(r["avg_nll"] > 0 for r in rows)
    # ln(p) of an observed transition is finite — no nulls/NaN ever.
    assert all(r["avg_nll"] == r["avg_nll"] for r in rows)


def test_q107_frequencies_form_a_distribution(spark, sf_dir):
    import collections

    rows = QUERIES["q107_benford_audit"](spark, sf_dir).collect()
    by_type = collections.defaultdict(float)
    for r in rows:
        assert 1 <= r["digit"] <= 9
        by_type[r["event_type"]] += r["obs_freq"]
        assert r["chi2"] >= 0
    for tot in by_type.values():
        assert abs(tot - 1.0) < 1e-4


def test_q107_no_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q107_benford_audit")
    assert "Join" not in plan


def test_q108_ranks_the_bounded_aggregate(spark, sf_dir):
    # the top-10 window must rank the <=125-row trigram aggregate, never
    # the event stream: partial agg before the single-partition window,
    # and no join anywhere.
    plan = _plan(spark, sf_dir, "q108_top_paths")
    assert "partial" in plan.lower()
    assert "Join" not in plan


def test_q109_broadcasts_pairs_not_corpus(spark, sf_dir):
    # the corpus-sized doc->source projection must stream; the bounded
    # near-dup pair set is the broadcast side (both hops).
    plan = _plan(spark, sf_dir, "q109_source_dup_matrix")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
