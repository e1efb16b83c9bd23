"""Sharded sequence packing (operators/packing.py, VERDICT round-4 #2).

The scale claim under test: packing parallelism is n_sources * n_shards
(not n_sources), while the greedy bin invariants and total mass are
preserved and bin ids stay dense per source.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.packing import pack_bins

CAP = 100


def _docs(spark, n=200, sources=("s0",)):
    # deterministic token counts 5..60, several over-cap docs mixed in
    rows = []
    for src in sources:
        for i in range(n):
            tc = 5 + (i * 13) % 56
            if i % 37 == 0:
                tc = CAP + 17  # over-cap doc: must land in a bin of its own
            rows.append((src, i, tc))
    return spark.createDataFrame(rows, "source string, doc_id long, tc long")


def _invariants(rows, cap):
    """Greedy invariants over (source, doc_id, tc, bin_id) rows."""
    by_bin: dict = {}
    for r in rows:
        by_bin.setdefault((r["source"], r["bin_id"]), []).append(r)
    for (_, _), docs in by_bin.items():
        tot = sum(d["tc"] for d in docs)
        assert tot <= cap or len(docs) == 1, f"overfull multi-doc bin: {docs}"
    # bin ids dense per source
    for src in {r["source"] for r in rows}:
        bins = sorted({r["bin_id"] for r in rows if r["source"] == src})
        assert bins == list(range(len(bins))), f"non-dense bins for {src}: {bins[:10]}"


def test_sharded_packing_invariants_and_mass(spark):
    docs = _docs(spark, n=200, sources=("s0", "s1"))
    for n_shards in (1, 4):
        rows = pack_bins(docs, cap=CAP, n_shards=n_shards).collect()
        assert len(rows) == 400  # every doc assigned exactly once
        assert sum(r["tc"] for r in rows) == sum(
            r["tc"] for r in docs.collect()
        )  # token mass preserved
        _invariants(rows, CAP)


def test_single_shard_matches_unsharded_recurrence(spark):
    """n_shards=1 reproduces the plain greedy recurrence exactly."""
    docs = _docs(spark, n=120)
    got = {
        (r["source"], r["doc_id"]): r["bin_id"]
        for r in pack_bins(docs, cap=CAP, n_shards=1).collect()
    }
    # reference recurrence in plain Python
    want = {}
    for src in ("s0",):
        rows = sorted(
            [(r["doc_id"], r["tc"]) for r in docs.where(F.col("source") == src).collect()]
        )
        bin_id, acc = 0, 0
        for doc_id, tc in rows:
            if acc > 0 and acc + tc > CAP:
                bin_id += 1
                acc = 0
            acc += tc
            want[(src, doc_id)] = bin_id
    assert got == want


def test_sharded_packing_parallelism_on_single_source(spark):
    """A single-source input decomposes into n_shards independent groups —
    the applyInPandas grouping key is (source, shard), so the physical plan
    partitions the work n_shards ways where the per-source packer had
    exactly one group."""
    n_shards = 8
    docs = _docs(spark, n=400, sources=("only",))
    packed = pack_bins(docs, cap=CAP, n_shards=n_shards)
    # every shard is a distinct group: doc_id % 8 covers 0..7 on 0..399
    shards = {
        r["shard"]
        for r in docs.withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(n_shards))
        ).select("shard").distinct().collect()
    }
    assert len(shards) == n_shards
    rows = packed.collect()
    assert len(rows) == 400
    _invariants(rows, CAP)
    # shard renumbering keeps per-source bins dense AND contiguous by shard:
    # docs of shard 0 (doc_id % 8 == 0) occupy the lowest bin ids
    shard_of = {r["doc_id"]: r["doc_id"] % n_shards for r in rows}
    max_bin_per_shard: dict = {}
    min_bin_per_shard: dict = {}
    for r in rows:
        s = shard_of[r["doc_id"]]
        max_bin_per_shard[s] = max(max_bin_per_shard.get(s, -1), r["bin_id"])
        min_bin_per_shard[s] = min(min_bin_per_shard.get(s, 1 << 60), r["bin_id"])
    for s in range(n_shards - 1):
        assert max_bin_per_shard[s] < min_bin_per_shard[s + 1], (
            "shard bin ranges must not overlap after renumbering"
        )


def test_pack_bins_rejects_bad_shards(spark):
    docs = _docs(spark, n=4)
    with pytest.raises(ValueError, match="n_shards"):
        pack_bins(docs, cap=CAP, n_shards=0)
