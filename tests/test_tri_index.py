"""Differential gate for streaming/tri_index.py:TriangleMaintainer — the
incremental twin of operators/graph.py:count_triangles (q87). After every
batch the maintained (node, n_tri) table must equal a full recompute over
the union of all edges so far; replay must be a no-op; re-posted edges must
create nothing."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.graph import count_triangles
from mapreduce_paper_implementation_spark.streaming.tri_index import (
    TriangleMaintainer,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(list(pairs) or [(0, 0)], ["src", "dst"]).where(
        F.lit(bool(pairs))
    )


def _as_dict(df):
    if df is None:
        return {}
    return {r["node"]: r["n_tri"] for r in df.collect()}


def _recompute(spark, pairs):
    if not pairs:
        return {}
    return _as_dict(count_triangles(_edges_df(spark, pairs)))


def test_planted_k4_across_batches(spark, tmp_path):
    # K4's 6 edges split 2/2/2: no triangle until batch 2 closes the first,
    # final counts 3 per node. Batch 3 re-posts old edges (reversed): no-op.
    m = TriangleMaintainer(spark, str(tmp_path / "tri"))
    b1 = [(0, 1), (2, 3)]
    b2 = [(0, 2), (1, 3)]
    b3 = [(0, 3), (1, 2)]
    seen = []
    for i, b in enumerate([b1, b2, b3]):
        seen += b
        m.update(_edges_df(spark, b), i)
        assert _as_dict(m.counts()) == _recompute(spark, seen), f"batch {i}"
    assert _as_dict(m.counts()) == {0: 3, 1: 3, 2: 3, 3: 3}

    # re-posted (and direction-flipped) edges create nothing
    delta = m.update(_edges_df(spark, [(1, 0), (3, 2)]), 3)
    assert delta.count() == 0
    assert _as_dict(m.counts()) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_random_batches_match_full_recompute(spark, tmp_path):
    rng = random.Random(7)
    m = TriangleMaintainer(spark, str(tmp_path / "tri"))
    seen: list[tuple[int, int]] = []
    for batch_id in range(4):
        batch = [(rng.randrange(20), rng.randrange(20)) for _ in range(40)]
        seen += batch
        m.update(_edges_df(spark, batch), batch_id)
        assert _as_dict(m.counts()) == _recompute(spark, seen), f"batch {batch_id}"


def test_replay_is_noop_and_compact_preserves_state(spark, tmp_path):
    import os

    m = TriangleMaintainer(spark, str(tmp_path / "tri"))
    m.update(_edges_df(spark, [(0, 1), (1, 2), (0, 2)]), 0)
    m.update(_edges_df(spark, [(2, 3), (0, 3)]), 1)
    before = _as_dict(m.counts())
    edges_before = sorted((r["a"], r["b"]) for r in m.edges().collect())

    assert m.update(_edges_df(spark, [(9, 10)]), 1) is None  # replay
    assert m.update(_edges_df(spark, [(9, 10)]), 0) is None  # older replay
    assert _as_dict(m.counts()) == before

    # compact folds the chain to one generation; served state unchanged,
    # delta dirs gone, and compact is idempotent.
    assert m.compact() == 1
    assert _as_dict(m.counts()) == before
    assert sorted((r["a"], r["b"]) for r in m.edges().collect()) == edges_before
    assert os.listdir(os.path.join(str(tmp_path / "tri"), "batches")) == []
    assert m.compact() == 1

    # ingest continues on top of the baseline: close the 1-2-3 triangle
    m.update(_edges_df(spark, [(1, 3)]), 2)
    assert _as_dict(m.counts()) == _recompute(
        spark, [(0, 1), (1, 2), (0, 2), (2, 3), (0, 3), (1, 3)]
    )


def test_policy_compacts_triangle_chain(spark, tmp_path):
    # TriangleMaintainer slots into the declarative maintenance layer
    # unchanged (same _CURRENT pointer + batches/b* chain discipline): the
    # chain-length policy fires, truncates, and answers are unaffected.
    from mapreduce_paper_implementation_spark.streaming.policy import (
        MaintainedIngest,
        MaintenancePolicy,
    )

    m = MaintainedIngest(
        TriangleMaintainer(spark, str(tmp_path / "tri")),
        MaintenancePolicy(compact_after_n_deltas=2),
    )
    seen: list[tuple[int, int]] = []
    batches = [
        [(0, 1), (1, 2)],
        [(0, 2), (2, 3)],
        [(0, 3), (1, 3)],
    ]
    for bid, b in enumerate(batches):
        seen += b
        m.update(_edges_df(spark, b), bid)
        assert _as_dict(m.counts()) == _recompute(spark, seen), f"batch {bid}"
    assert [(e.batch_id, e.action) for e in m.events] == [(1, "compact")]
    assert m._chain_length() == 1  # batch 2's delta rides on the baseline
    # replay fires nothing
    n_events = len(m.events)
    assert m.update(_edges_df(spark, batches[0]), 0) is None
    assert len(m.events) == n_events


def test_compact_mid_stream_matches_recompute(spark, tmp_path):
    rng = random.Random(11)
    m = TriangleMaintainer(spark, str(tmp_path / "tri"))
    seen: list[tuple[int, int]] = []
    for batch_id in range(4):
        batch = [(rng.randrange(15), rng.randrange(15)) for _ in range(25)]
        seen += batch
        m.update(_edges_df(spark, batch), batch_id)
        if batch_id == 1:
            m.compact()
        assert _as_dict(m.counts()) == _recompute(spark, seen), f"batch {batch_id}"
