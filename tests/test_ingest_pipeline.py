"""The daily-ingest topology, end to end: SeenKeysMaintainer (exact
content-digest gate) feeding DedupIndexMaintainer (near-dup gate), three
batches, against a pure-Python replay of the same sequential semantics.

Each maintainer is already proven equal to its batch expression in
isolation (tests/test_membership.py, tests/test_streaming.py); this test
pins that they COMPOSE: per batch, exact duplicates of any earlier doc are
dropped first (never reaching the near-dup index), then the novel remainder
is probed against the accumulated index of all earlier NOVEL docs, and the
flagged near-dups are exactly the >=threshold Jaccard matches computed
independently in Python with the engine's own tokenizer/shingle
definitions."""

from __future__ import annotations

import random
import re

import pyspark.sql.functions as F

THRESH = 0.8
VOCAB = [f"w{i}" for i in range(120)]


def _mk_docs():
    """Deterministic corpus: 3 batches, with planted cross-batch exact
    duplicates and near-duplicates (one-token substitution: J ~ (n-4)/(n+2)
    >= 0.8 at n = 40 tokens)."""
    rng = random.Random(77)
    mk = lambda: [rng.choice(VOCAB) for _ in range(40)]  # noqa: E731
    base = [mk() for _ in range(18)]
    batches, did = [], 0

    def doc(tokens):
        nonlocal did
        did += 1
        return (did, " ".join(tokens))

    b0 = [doc(base[i]) for i in range(6)]
    near_of_0 = base[0][:]
    near_of_0[7] = "zzz"  # near-dup of batch-0 doc
    b1 = [doc(base[i]) for i in range(6, 12)] + [
        doc(base[2]),       # exact dup of batch-0 doc -> dropped at the gate
        doc(near_of_0),     # near-dup of batch-0 doc -> flagged by the index
    ]
    near_of_b1 = base[8][:]
    near_of_b1[11] = "qqq"
    b2 = [doc(base[i]) for i in range(12, 18)] + [
        doc(base[7]),       # exact dup of a batch-1 doc
        doc(near_of_b1),    # near-dup of a batch-1 doc
        doc(base[2]),       # exact dup again (of batch-0)
    ]
    batches = [b0, b1, b2]
    return batches


def _shingles(text):
    toks = [t for t in re.split(r"[^A-Za-z]+", text) if t]
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _jaccard(a, b):
    return len(a & b) / len(a | b) if a | b else 0.0


def test_ingest_topology_matches_python_replay(spark, tmp_path):
    from mapreduce_paper_implementation_spark.streaming.bloom import SeenKeysMaintainer
    from mapreduce_paper_implementation_spark.streaming.dedup_index import (
        DedupIndexMaintainer,
    )

    batches = _mk_docs()
    seen = SeenKeysMaintainer(spark, str(tmp_path / "seen"), ["content_hash"])
    index = DedupIndexMaintainer(spark, str(tmp_path / "index"), threshold=THRESH)

    # --- engine: sequential ingest ------------------------------------
    flagged_engine: dict[int, set] = {}
    corpus_engine: set = set()
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
            "content_hash", F.md5("text")
        )
        tagged = seen.update(df, bid)
        novel = tagged.where(~F.col("seen")).select("doc_id", "text")
        dups = index.update(novel, bid)
        flagged_engine[bid] = {
            (r["new_id"], r["corpus_id"]) for r in dups.collect()
        }
        corpus_engine |= {r["doc_id"] for r in novel.collect()}

    # --- python replay of the same sequential semantics ----------------
    flagged_py: dict[int, set] = {}
    corpus_py: list[tuple[int, str]] = []
    seen_texts: set = set()
    for bid, rows in enumerate(batches):
        prior_novel = list(corpus_py)
        novel_rows = []
        for did, text in rows:
            if text in seen_texts:
                continue
            novel_rows.append((did, text))
        flagged_py[bid] = {
            (did, pid)
            for did, text in novel_rows
            for pid, ptext in prior_novel
            if _jaccard(_shingles(text), _shingles(ptext)) >= THRESH
        }
        # maintainer semantics: the whole novel batch joins the index/corpus
        seen_texts |= {t for _, t in rows}
        corpus_py += novel_rows

    assert {d for d, _ in corpus_py} == corpus_engine
    for bid in range(len(batches)):
        assert flagged_engine[bid] == flagged_py[bid], (
            bid,
            flagged_engine[bid],
            flagged_py[bid],
        )
    # the planted structure actually fired: both gates saw work
    assert sum(len(v) for v in flagged_py.values()) >= 2
    total_docs = sum(len(b) for b in batches)
    assert len(corpus_py) < total_docs  # exact gate dropped the replays


def test_policy_driven_topology_self_maintains(spark, sf_dir, tmp_path):
    """VERDICT r06 ask #3: the same gated topology (exact gate -> near-dup
    index) plus the gram index, each wrapped in a declarative
    MaintenancePolicy, self-compacts as batches flow — the triggers fire at
    the declared chain length, the chains are actually truncated, and the
    data answers are identical to an unmaintained twin."""
    from mapreduce_paper_implementation_spark.streaming.bloom import SeenKeysMaintainer
    from mapreduce_paper_implementation_spark.streaming.dedup_index import (
        DedupIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.gram_index import (
        GramIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.policy import (
        MaintainedIngest,
        MaintenancePolicy,
    )

    batches = _mk_docs()
    pol = MaintenancePolicy(compact_after_n_deltas=2)
    seen = MaintainedIngest(
        SeenKeysMaintainer(spark, str(tmp_path / "seen"), ["content_hash"]), pol
    )
    index = MaintainedIngest(
        DedupIndexMaintainer(spark, str(tmp_path / "index"), threshold=THRESH), pol
    )
    grams = MaintainedIngest(
        GramIndexMaintainer(spark, str(tmp_path / "grams"), k=4), pol
    )
    # unmaintained twin: same data path, no policies
    index_twin = DedupIndexMaintainer(
        spark, str(tmp_path / "index_twin"), threshold=THRESH
    )
    grams_twin = GramIndexMaintainer(spark, str(tmp_path / "grams_twin"), k=4)

    flagged, flagged_twin = set(), set()
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
            "content_hash", F.md5("text")
        )
        novel = seen.update(df, bid).where(~F.col("seen")).select("doc_id", "text")
        flagged |= {
            (r["new_id"], r["corpus_id"]) for r in index.update(novel, bid).collect()
        }
        grams.update(novel, bid)
        flagged_twin |= {
            (r["new_id"], r["corpus_id"])
            for r in index_twin.update(novel, bid).collect()
        }
        grams_twin.update(novel, bid)

    # the compaction policy fired on every chain maintainer exactly when the
    # chain reached 2 deltas (after batch 1; batch 2's lone delta stays)...
    for m in (seen, index, grams):
        assert [(e.batch_id, e.action) for e in m.events] == [(1, "compact")], m.events
        # ...and genuinely truncated the chain: only batch 2's delta remains.
        assert m._chain_length() == 1
    # ...without changing any answer vs the unmaintained twin.
    assert flagged == flagged_twin
    cur = {tuple(r) for r in grams.current().collect()}
    assert cur == {tuple(r) for r in grams_twin.current().collect()}

    # replaying a committed batch fires nothing.
    n_events = len(index.events)
    df0 = spark.createDataFrame(batches[0], "doc_id long, text string")
    assert index.update(df0, 0) is None
    assert len(index.events) == n_events


def test_policy_retrain_fires_on_occupancy_growth(spark, sf_dir, tmp_path):
    """ANN retrain policy: feeding batches grows the hottest cell past
    ratio x the post-wrap baseline; the policy retrains, re-baselines, and
    the maintained index keeps answering (non-empty committed store)."""
    from mapreduce_paper_implementation_spark.sources.tables import load_table
    from mapreduce_paper_implementation_spark.streaming.ann_index import (
        AnnIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.policy import (
        MaintainedIngest,
        MaintenancePolicy,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m = MaintainedIngest(
        AnnIndexMaintainer(
            spark, str(tmp_path / "state"), n_cells=4, nassign=2, threshold=0.45
        ),
        MaintenancePolicy(retrain_occupancy_ratio=1.5, retrain_k=8),
    )
    for bid in range(5):
        m.update(emb.where(F.col("vec_id") % 5 == bid), bid)

    retrains = [e for e in m.events if e.action == "retrain"]
    # 5 equal batches grow the hottest cell ~5x the batch-0 baseline; the
    # 1.5x trigger must fire at least once, and after the re-baseline the
    # remaining batches can fire again only past 1.5x the NEW baseline.
    assert retrains, m.events
    assert m.maintainer.n_cells == 8  # retrain_k applied
    occ = m.maintainer.occupancy()
    assert sum(occ.values()) > 0


def test_policy_vacuum_bounds_versioned_state(spark, sf_dir, tmp_path):
    """Vacuum policy on a versioned maintainer (rollup): after each batch
    only the committed version plus `keep` predecessors remain on disk, the
    events record the removals, and replays fire nothing."""
    import os

    from mapreduce_paper_implementation_spark.sources.tables import load_table
    from mapreduce_paper_implementation_spark.streaming.policy import (
        MaintainedIngest,
        MaintenancePolicy,
    )
    from mapreduce_paper_implementation_spark.streaming.rollup import RollupMaintainer

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "rollup")
    m = MaintainedIngest(
        RollupMaintainer(spark, state), MaintenancePolicy(vacuum_keep=1)
    )
    for bid in range(4):
        m.update(ev.where(F.col("event_id") % 4 == bid), bid)

    versions = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert versions == ["v0000000003"]  # keep=1: the committed version only
    assert [e.action for e in m.events] == ["vacuum"] * 3  # batches 1-3
    # replay: no state change, no new events
    assert m.update(ev.where(F.col("event_id") % 4 == 0), 0) is None
    assert [e.action for e in m.events] == ["vacuum"] * 3
    # maintained state is still the full fold (vacuum never drops committed)
    assert m.current_state().count() > 0
