"""Differential gates for streaming/pagerank_index.py:PageRankMaintainer —
the incremental serving twin of q74 (VERDICT r09 ask #3).

Contract 1 (bit-exact): after EVERY edge batch, serve_q74() over the
maintained edge state equals the batch `pagerank` kernel over the union of
all edges so far — same integers, every node.

Contract 2 (warm-start convergence): update() re-converges the rank vector
warm-started from the previous version; on an incremental batch that takes
MEASURABLY fewer fixpoint rounds than a cold uniform start over the same
graph, the served vector is a genuine fixpoint (one more kernel round is
bit-identical — integer arithmetic makes "converged" bit-testable), and it
agrees with the cold fixpoint within the floor-quantization envelope
(measured ~13 units at scale 1e12 on the sf0.01 events graph; gated at
1000 units = 1e-9 of total rank mass).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.graph import (
    pagerank,
    pagerank_fixpoint,
)
from mapreduce_paper_implementation_spark.streaming.pagerank_index import (
    PageRankMaintainer,
)

SCHEMA = "src long, dst long"
QUANT_BOUND = 1000  # integer rank units; 1e-9 of the 1e12 scaled mass


def _ranks(df):
    return {(r["node"], r["rank_scaled"]) for r in df.collect()}


def _edge_batches(spark, sf_dir):
    """The q74 events graph split into three contiguous thirds (plus a tiny
    tail delta) — contiguous slices keep each batch a realistic 'new links
    discovered today' delta."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = (
        ev.select(
            F.col("user_id").alias("src"),
            F.get_json_object("props", "$.k").cast("bigint").alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .distinct()
        .collect()
    )
    rows = sorted((r["src"], r["dst"]) for r in edges)
    k = len(rows) // 3
    return [rows[:k], rows[k : 2 * k], rows[2 * k :]]


def test_pagerank_maintainer_serves_q74_bitexact(spark, sf_dir, tmp_path):
    batches = _edge_batches(spark, sf_dir)
    m = PageRankMaintainer(spark, str(tmp_path / "pr_state"))
    seen: list = []
    for bid, b in enumerate(batches):
        n_iters = m.update(spark.createDataFrame(b, SCHEMA), bid)
        assert n_iters is not None and n_iters >= 1
        seen += b
        want = _ranks(pagerank(spark.createDataFrame(seen, SCHEMA), iters=3))
        got = _ranks(m.serve_q74(iters=3))
        assert got == want, f"batch {bid}: served q74 diverged from batch kernel"


def test_pagerank_warm_start_converges_faster_and_within_quantization(
    spark, sf_dir, tmp_path
):
    batches = _edge_batches(spark, sf_dir)
    m = PageRankMaintainer(spark, str(tmp_path / "pr_state"))
    iters_per_batch = [
        m.update(spark.createDataFrame(b, SCHEMA), bid)
        for bid, b in enumerate(batches)
    ]
    assert all(i is not None for i in iters_per_batch)
    # cold fixpoint over the full graph, uniform start
    full = spark.createDataFrame([e for b in batches for e in b], SCHEMA)
    cold_df, cold_iters = pagerank_fixpoint(full)
    assert cold_iters is not None
    warm_iters = iters_per_batch[-1]
    assert m.meta()["warm"] is True and m.meta()["n_iters"] == warm_iters
    # the headline claim: warm re-convergence after an incremental batch
    # beats a cold start on the same graph
    assert warm_iters < cold_iters, (warm_iters, cold_iters)

    # served vector is a GENUINE fixpoint: one more kernel round from it is
    # bit-identical (integer arithmetic makes this an exact equality test)
    served = m.serve_converged()
    again, again_iters = pagerank_fixpoint(
        full, r0=served.select("node", F.col("rank_scaled").alias("r"))
    )
    assert again_iters == 1
    assert _ranks(again) == _ranks(served)

    # warm and cold fixpoints agree within the floor-quantization envelope
    cold = {r["node"]: r["rank_scaled"] for r in cold_df.collect()}
    warm = {r["node"]: r["rank_scaled"] for r in served.collect()}
    assert cold.keys() == warm.keys()
    worst = max(abs(cold[v] - warm[v]) for v in cold)
    assert worst <= QUANT_BOUND, f"quantization envelope exceeded: {worst}"


def test_pagerank_maintainer_replay_is_noop(spark, sf_dir, tmp_path):
    batches = _edge_batches(spark, sf_dir)
    m = PageRankMaintainer(spark, str(tmp_path / "pr_state"))
    assert m.update(spark.createDataFrame(batches[0], SCHEMA), 0) is not None
    assert m.update(spark.createDataFrame(batches[1], SCHEMA), 1) is not None
    before_ranks = _ranks(m.serve_converged())
    before_edges = {(r["src"], r["dst"]) for r in m.edges().collect()}
    # replaying batch 1 — even with DIFFERENT payload — must not touch state
    assert m.update(spark.createDataFrame(batches[2], SCHEMA), 1) is None
    assert _ranks(m.serve_converged()) == before_ranks
    assert {(r["src"], r["dst"]) for r in m.edges().collect()} == before_edges


def test_pagerank_maintainer_overlapping_reingest_is_exact(spark, tmp_path):
    """Edge set semantics: re-sending already-known edges in a later batch
    (overlapping ingest) cannot change the graph, so served ranks match the
    recompute over the plain union."""
    m = PageRankMaintainer(spark, str(tmp_path / "pr_state"))
    b0 = [(1, 2), (2, 3), (3, 1), (3, 4)]
    b1 = [(2, 3), (3, 4), (4, 1)]  # two of three edges are re-sends
    m.update(spark.createDataFrame(b0, SCHEMA), 0)
    m.update(spark.createDataFrame(b1, SCHEMA), 1)
    want = _ranks(pagerank(spark.createDataFrame(sorted(set(b0 + b1)), SCHEMA), iters=3))
    assert _ranks(m.serve_q74(iters=3)) == want
    assert m.edges().count() == len(set(b0 + b1))
