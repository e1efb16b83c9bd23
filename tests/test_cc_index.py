"""Differential gates for streaming/cc_index.py:ComponentsMaintainer — the
incremental twin of operators/graph.py:connected_components (q41).
VERDICT r05/r06 stretch: after every delta-edge batch the maintained label
table must equal a full recompute over the union of all edges so far,
including the retroactive relabel when a new edge merges two existing
components."""

import random

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.graph import (
    connected_components,
)
from mapreduce_paper_implementation_spark.streaming.cc_index import (
    ComponentsMaintainer,
)

SCHEMA = "id_a long, id_b long"


def _labels(df):
    return {(r["id"], r["component"]) for r in df.collect()}


def _full(spark, edges):
    # max_iter raised: sparse random graphs grow long chains whose diameter
    # exceeds the dedup-cluster default of 20 propagation rounds.
    return _labels(
        connected_components(spark.createDataFrame(edges, SCHEMA), max_iter=60)
    )


def test_cc_maintainer_matches_full_recompute_planted(spark, tmp_path):
    """Planted batches exercising every transition: fresh components, a
    cross-batch merge (retroactive relabel), growth of an old component by
    a new vertex, and an all-new component."""
    batches = [
        [(1, 2), (3, 4)],          # two fresh components {1,2} {3,4}
        [(5, 6), (2, 3)],          # new comp {5,6}; edge MERGES {1,2}+{3,4}
        [(4, 100)],                # new vertex joins the merged component
        [(7, 8), (8, 9)],          # an all-new 3-vertex chain
    ]
    m = ComponentsMaintainer(spark, str(tmp_path / "state"))
    seen: list = []
    for bid, b in enumerate(batches):
        delta = m.update(spark.createDataFrame(b, SCHEMA), bid)
        seen += b
        assert _labels(m.labels()) == _full(spark, seen), f"batch {bid}"
        if bid == 1:
            # the merge batch must RE-EMIT the relabeled {3,4} rows.
            d = _labels(delta)
            assert (3, 1) in d and (4, 1) in d
            assert (5, 5) in d and (6, 5) in d
            # vertices 1,2 keep label 1 -> not re-emitted (delta contract)
            assert not any(i == 1 or i == 2 for i, _ in d)
        if bid == 2:
            assert _labels(delta) == {(100, 1)}


def test_cc_maintainer_matches_full_recompute_random(spark, tmp_path):
    """200-vertex random graph in 3 batches (seeded): label table equals
    the full recompute after every batch."""
    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    thirds = [edges[0::3], edges[1::3], edges[2::3]]
    m = ComponentsMaintainer(spark, str(tmp_path / "state"), max_iter=60)
    seen: list = []
    for bid, b in enumerate(thirds):
        m.update(spark.createDataFrame(b, SCHEMA), bid)
        seen += b
        assert _labels(m.labels()) == _full(spark, seen), f"batch {bid}"


def test_cc_maintainer_replay_and_vacuum(spark, tmp_path):
    m = ComponentsMaintainer(spark, str(tmp_path / "state"))
    m.update(spark.createDataFrame([(1, 2)], SCHEMA), 0)
    m.update(spark.createDataFrame([(2, 3)], SCHEMA), 1)
    before = _labels(m.labels())
    # replay of a committed batch: None, state untouched
    assert m.update(spark.createDataFrame([(9, 10)], SCHEMA), 1) is None
    assert m.update(spark.createDataFrame([(9, 10)], SCHEMA), 0) is None
    assert _labels(m.labels()) == before
    # vacuum drops the superseded version, keeps the committed one
    assert m.vacuum(keep=0) == [0]
    assert _labels(m.labels()) == before
    # an edge inside one component is a no-op delta (nothing relabeled)
    delta = m.update(spark.createDataFrame([(1, 3)], SCHEMA), 2)
    assert _labels(delta) == set()
    assert _labels(m.labels()) == before


def test_cc_maintainer_composes_with_dedup_index(spark, sf_dir, tmp_path):
    """The production topology: per ingest batch, DedupIndexMaintainer
    emits the batch's cross-batch near-dup pairs; ComponentsMaintainer
    folds them into the standing cluster map. After all batches the
    maintained labels must equal a one-shot connected_components over the
    union of every emitted pair."""
    from mapreduce_paper_implementation_spark.sources.tables import load_table
    from mapreduce_paper_implementation_spark.streaming.dedup_index import (
        DedupIndexMaintainer,
    )

    docs = load_table(spark, sf_dir, "documents")
    index = DedupIndexMaintainer(spark, str(tmp_path / "index"), threshold=0.8)
    cc = ComponentsMaintainer(spark, str(tmp_path / "cc"))

    all_pairs: list = []
    for bid in range(3):
        dups = index.update(docs.where(F.col("doc_id") % 3 == bid), bid)
        pairs = dups.select(
            F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b")
        )
        rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
        all_pairs += rows
        if rows:
            cc.update(spark.createDataFrame(rows, SCHEMA), bid)

    assert all_pairs, "fixture must contain cross-batch near-dups"
    assert _labels(cc.labels()) == _full(spark, all_pairs)

    # ...and the release-cut readout on top: the leakage-safe split served
    # from the maintained labels equals the batch q124 assignment over the
    # same pair graph (cluster_split_view is an O(labels) readout — no
    # corpus re-cluster at the cut)
    from mapreduce_paper_implementation_spark.operators.serving import (
        cluster_split_assign,
    )
    from mapreduce_paper_implementation_spark.streaming.cc_index import (
        cluster_split_view,
    )

    served = sorted(map(tuple, cluster_split_view(cc.labels(), docs).collect()))
    batch = sorted(
        map(
            tuple,
            cluster_split_assign(
                docs, connected_components(spark.createDataFrame(all_pairs, SCHEMA))
            ).collect(),
        )
    )
    assert served == batch


def test_cluster_split_view_matches_batch_assignment(spark, tmp_path):
    """q124's serving twin: after every edge batch, the split assignment
    served from MAINTAINED labels (cluster_split_view) equals the batch
    assignment from a full connected_components recompute — bit-exact,
    because both run the same cluster_split_assign tail and the label
    tables are gated equal per batch. Also demonstrates the documented
    serving caveat: at least one doc's split CHANGES across batches when
    a component merge lowers its cluster id (why production pins splits
    at release cuts)."""
    from mapreduce_paper_implementation_spark.operators.serving import (
        cluster_split_assign,
    )
    from mapreduce_paper_implementation_spark.streaming.cc_index import (
        cluster_split_view,
    )

    rng = random.Random(11)
    docs = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(120)], "doc_id long, text string"
    ).localCheckpoint()
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    thirds = [edges[0::3], edges[1::3], edges[2::3]]

    def rows(df):
        return sorted(map(tuple, df.collect()))

    m = ComponentsMaintainer(spark, str(tmp_path / "state"), max_iter=60)
    seen: list = []
    assignments = []
    label_maps = []
    for bid, b in enumerate(thirds):
        m.update(spark.createDataFrame(b, SCHEMA), bid)
        seen += b
        served = rows(cluster_split_view(m.labels(), docs))
        batch = rows(
            cluster_split_assign(
                docs, connected_components(spark.createDataFrame(seen, SCHEMA), max_iter=60)
            )
        )
        assert served == batch, f"batch {bid}"
        assignments.append({r[0]: r[4] for r in served})  # doc_id -> split_c
        label_maps.append({r["id"]: r["component"] for r in m.labels().collect()})
    moved = any(
        assignments[i][d] != assignments[i + 1][d]
        for i in range(len(assignments) - 1)
        for d in assignments[i]
    )
    # an actual cross-batch MERGE: some already-labeled vertex's component
    # label strictly DECREASED when a later batch connected its component
    # to a lower-id one (labels are min-reachable ids and only ever drop)
    merged = any(
        label_maps[i + 1][v] < label_maps[i][v]
        for i in range(len(label_maps) - 1)
        for v in label_maps[i]
        if v in label_maps[i + 1]
    )
    # with 60 random edges folded in two increments over 120 docs, a merge
    # that lowers a min label (and crosses a split boundary) is
    # overwhelmingly likely under this seed; pin it so the caveat stays
    # demonstrated rather than asserted
    assert merged and moved
