"""Scale-stress harness self-checks (scripts/gen_scale.py).

The scale bench's evidential value rests on two properties proved here at a
tiny factor: (1) generation is deterministic — same (factor, seed) must give
byte-identical corpora so recorded BENCH_SCALE.json numbers are reproducible;
(2) planted ground truth is REAL — the engine's exact-verify dedup operators
recover exactly the planted positives on a generated corpus (recall 1.0,
zero extras), so a recall regression at 10x is an engine bug, not noise.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from gen_scale import EPS, generate  # noqa: E402


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale"))
    ds = generate(0.1, out, seed=7)
    with open(os.path.join(ds, "truth.json")) as f:
        truth = json.load(f)
    return ds, truth


def _positives(pairs, thresh):
    pos, band = set(), set()
    for a, b, s in pairs:
        key = (min(a, b), max(a, b))
        (band if abs(s - thresh) < EPS else pos if s >= thresh else set()).add(key)
    return pos, band


def test_generation_deterministic(tmp_path, tiny_corpus):
    ds, truth = tiny_corpus
    ds2 = generate(0.1, str(tmp_path), seed=7)
    for fname in ("documents.parquet", "embeddings.parquet"):
        with open(os.path.join(ds, fname), "rb") as a, open(
            os.path.join(ds2, fname), "rb"
        ) as b:
            assert a.read() == b.read(), f"{fname} not byte-identical across runs"


def test_truth_is_clean(tiny_corpus):
    _, truth = tiny_corpus
    # cross-pair sample must stay far below every bench threshold
    assert truth["worst_sampled_cross_jaccard"] < 0.1
    # planted clusters cover ~6% of docs and pairs carry exact scores
    n_clustered = sum(len(c) for c in truth["doc_clusters"])
    assert 0.03 * truth["n_docs"] <= n_clustered <= 0.1 * truth["n_docs"]
    assert all(0.0 <= p[2] <= 1.0 for p in truth["doc_pairs"])


def test_minhash_recovers_planted_pairs(spark, tiny_corpus):
    from mapreduce_paper_implementation_spark.operators.caching import release_persisted
    from mapreduce_paper_implementation_spark.operators.dedup import minhash_lsh_pairs
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    ds, truth = tiny_corpus
    docs = load_table(spark, ds, "documents")
    try:
        got = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
        }
    finally:
        release_persisted()
    pos, band = _positives(truth["doc_pairs"], 0.8)
    got -= band
    assert got == pos, (
        f"planted recall broken: missing={sorted(pos - got)[:5]} "
        f"extras={sorted(got - pos)[:5]}"
    )


def test_blocked_gemm_recovers_planted_vec_pairs(spark, tiny_corpus):
    from mapreduce_paper_implementation_spark.operators.dedup import (
        embedding_neardup_pairs_blocked,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    ds, truth = tiny_corpus
    emb = load_table(spark, ds, "embeddings")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs_blocked(emb, threshold=0.85).collect()
    }
    pos, band = _positives(truth["vec_pairs"], 0.85)
    assert got - band == pos


def test_semantic_dedup_is_within_cell_subset_with_high_recall(spark, tiny_corpus):
    """SemDeDup contract on the planted corpus: (1) its pairs are a SUBSET of
    the exact all-pairs result at the same threshold with identical scores
    (the within-cell restriction can only drop pairs, never invent or
    rescore them); (2) planted near-dups are ~identical vectors, so they
    co-locate in a k-means cell and recall stays high — the quantified form
    of 'cross-cell pairs carry no semantic-dup signal'."""
    from mapreduce_paper_implementation_spark.operators.dedup import (
        embedding_neardup_pairs_blocked,
        semantic_dedup_pairs,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    ds, truth = tiny_corpus
    emb = load_table(spark, ds, "embeddings")
    all_pairs = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_neardup_pairs_blocked(emb, threshold=0.85).collect()
    }
    sem = {
        (r.id_a, r.id_b): r.cos_sim
        for r in semantic_dedup_pairs(emb, n_cells=8, threshold=0.85).collect()
    }
    assert set(sem) <= set(all_pairs)
    assert all(all_pairs[k] == v for k, v in sem.items())
    pos, band = _positives(truth["vec_pairs"], 0.85)
    if pos:
        recall = len((set(sem) - band) & pos) / len(pos)
        assert recall >= 0.9, f"semantic recall {recall} — cells split planted dups"
