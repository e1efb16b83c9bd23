"""Round-5 fixes, one test block per ADVICE/VERDICT item:

- floor_div is exact over the FULL int64 range (ADVICE: the old
  subtract-modulus form double-rounded past 2^53 and ANSI-overflowed at
  long-min).
- _merge_counts space-saving admission baseline (ADVICE: a pruned key used
  to restart from zero; now it readmits at batch_count + max-evicted-bound).
- Catalog rejects incompatible dtype drift instead of silently casting to
  all-NULL columns (ADVICE: only allowlisted width/encoding drift casts).
- textkv part files are unconditionally job-unique (ADVICE: the
  probe-then-suffix append scheme raced under concurrent jobs).
- lsh_topk requires dim= (VERDICT #5: the .first() fallback was a driver
  round-trip per plan build).
- scoped_persist/release_persisted cache lifecycle (VERDICT #6: operator
  persists must be releasable, not LRU-evicted-eventually).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# floor_div exact over full int64
# ---------------------------------------------------------------------------


def test_floor_div_exact_at_int64_edges(spark):
    from mapreduce_paper_implementation_spark.functions.numeric import floor_div

    xs = [
        -(2**63),
        -(2**63) + 1,
        2**63 - 1,
        2**53 + 1,
        -(2**53) - 3,
        -7,
        7,
        0,
        -1000,
        999,
        -999,
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    for d in (1, 3, 1000, 86_400_000_000):
        got = {r["x"]: r["q"] for r in df.select("x", floor_div(F.col("x"), d).alias("q")).collect()}
        for x in xs:
            assert got[x] == x // d, (x, d, got[x], x // d)


def test_floor_div_rejects_nonpositive_divisor():
    from mapreduce_paper_implementation_spark.functions.numeric import floor_div

    with pytest.raises(ValueError, match="positive divisor"):
        floor_div(F.col("x"), 0)
    with pytest.raises(ValueError, match="positive divisor"):
        floor_div(F.col("x"), -5)


# ---------------------------------------------------------------------------
# sketch: space-saving admission baseline
# ---------------------------------------------------------------------------


def test_merge_counts_tracks_eviction_bound():
    from mapreduce_paper_implementation_spark.operators.sketch import (
        _EVICT_FACTOR,
        _merge_counts,
    )

    cap = 4
    acc: dict = {}
    # one batch big enough to trigger a prune: 20 keys, counts 1..20
    counts = {f"k{i:02d}": i + 1 for i in range(_EVICT_FACTOR * cap + 4)}
    bound = _merge_counts(acc, counts, cap, 0)
    # top-cap retained; bound = count of the first pruned (rank cap+1) key
    assert len(acc) == cap
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert bound == ranked[cap][1]
    # a NEW key arriving after the eviction admits at batch_count + bound
    bound2 = _merge_counts(acc, {"fresh": 2}, cap, bound)
    assert acc["fresh"] == 2 + bound
    assert bound2 == bound  # no prune this round -> bound unchanged
    # a RESIDENT key keeps accumulating exactly (no baseline re-applied)
    top_key = ranked[0][0]
    before = acc[top_key]
    _merge_counts(acc, {top_key: 5}, cap, bound2)
    assert acc[top_key] == before + 5


def test_merge_counts_resident_heavy_keys_stay_exact():
    """True heavy hitters never get evicted, so their counts stay exact even
    while cold churn drives repeated evictions around them."""
    from mapreduce_paper_implementation_spark.operators.sketch import _merge_counts

    cap = 10
    acc: dict = {}
    bound = 0
    for batch in range(50):
        counts = {f"cold-{batch}-{i}": 1 for i in range(60)}
        counts.update({f"hot-{h}": 20 for h in range(5)})
        bound = _merge_counts(acc, counts, cap, bound)
    for h in range(5):
        assert acc[f"hot-{h}"] == 50 * 20


# ---------------------------------------------------------------------------
# catalog: incompatible drift errors loudly
# ---------------------------------------------------------------------------


def _region_table(regionkey_arr, name_arr):
    return pa.table({"r_regionkey": regionkey_arr, "r_name": name_arr})


def test_catalog_rejects_numeric_to_string_drift(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    bad = _region_table(
        pa.array([0, 1], pa.int32()), pa.array([100, 200], pa.int64())
    )  # r_name (declared string) arrives numeric
    pq.write_table(bad, str(tmp_path / "region.parquet"))
    with pytest.raises(ValueError, match="compatible-drift allowlist"):
        load_table(spark, str(tmp_path), "region")


def test_catalog_rejects_string_to_int_drift(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    bad = _region_table(
        pa.array(["0", "1"], pa.string()), pa.array(["AFRICA", "ASIA"], pa.string())
    )  # r_regionkey (declared int) arrives as string
    pq.write_table(bad, str(tmp_path / "region.parquet"))
    with pytest.raises(ValueError, match="compatible-drift allowlist"):
        load_table(spark, str(tmp_path), "region")


def test_catalog_still_accepts_width_drift(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    ok = _region_table(
        pa.array([0, 1], pa.int64()), pa.array(["AFRICA", "ASIA"], pa.string())
    )  # int64 -> declared int: allowlisted narrowing
    pq.write_table(ok, str(tmp_path / "region.parquet"))
    df = load_table(spark, str(tmp_path), "region")
    assert df.schema["r_regionkey"].dataType.simpleString() == "int"
    assert {r["r_name"] for r in df.collect()} == {"AFRICA", "ASIA"}


# ---------------------------------------------------------------------------
# textkv: job-unique part names
# ---------------------------------------------------------------------------


def test_textkv_part_names_are_job_unique(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.textkv_datasource import (
        TextKVDataSource,
    )

    spark.dataSource.register(TextKVDataSource)
    out = str(tmp_path / "kv")
    one = spark.createDataFrame([("a", "1")], "key string, value string")
    two = spark.createDataFrame([("b", "2")], "key string, value string")
    one.coalesce(1).write.format("textkv").mode("append").save(out)
    two.coalesce(1).write.format("textkv").mode("append").save(out)
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    # both jobs wrote partition 0; tokens keep the filenames distinct with
    # no existence probing (the probe was the concurrency race)
    assert len(parts) == 2
    assert all(p.startswith("part-00000-") for p in parts)
    assert parts[0] != parts[1]
    back = {(r["key"], r["value"]) for r in spark.read.format("textkv").load(out).collect()}
    assert back == {("a", "1"), ("b", "2")}


def test_textkv_overwrite_keeps_only_own_token(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.textkv_datasource import (
        TextKVDataSource,
    )

    spark.dataSource.register(TextKVDataSource)
    out = str(tmp_path / "kv")
    wide = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(16)], "key string, value string"
    )
    wide.repartition(4).write.format("textkv").mode("overwrite").save(out)
    narrow = spark.createDataFrame([("a", "1")], "key string, value string")
    narrow.coalesce(1).write.format("textkv").mode("overwrite").save(out)
    parts = [f for f in os.listdir(out) if not f.startswith((".", "_"))]
    assert len(parts) == 1
    tokens = {p.rsplit("-", 1)[1] for p in parts}
    assert len(tokens) == 1  # every surviving file bears the second job's token


# ---------------------------------------------------------------------------
# lsh_topk: dim is required
# ---------------------------------------------------------------------------


def test_lsh_topk_requires_dim(spark):
    from mapreduce_paper_implementation_spark.operators.similarity import lsh_topk

    emb = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(TypeError, match="requires dim"):
        lsh_topk(emb, emb.limit(1))


# ---------------------------------------------------------------------------
# scoped persist lifecycle
# ---------------------------------------------------------------------------


def test_release_persisted_returns_cache_to_baseline(spark):
    from mapreduce_paper_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_paper_implementation_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    release_persisted()
    spark.catalog.clearCache()
    assert cache_mgr.isEmpty()

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2} tok{i + 3}") for i in range(30)]
        + [(100, "a b c d e"), (101, "a b c d e")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs)
    assert pairs.count() >= 1
    assert not cache_mgr.isEmpty(), "operator should have persisted intermediates"
    released = release_persisted()
    assert released >= 1
    assert cache_mgr.isEmpty(), "release_persisted must drop every registered cache"
