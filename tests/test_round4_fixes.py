"""Round-4 robustness fixes, each pinned by VERDICT.md r03:

- dtype-adaptive events.ts loading (the r03 round-killer): the catalog must
  read BOTH historical fixture encodings — TIMESTAMP(NANOS)-as-long and plain
  TIMESTAMP(MICROS) — to the same TimestampType values.
- approx_top_k accumulator is memory-bounded DURING accumulation, not only
  at yield.
- textkv overwrite removes stale part files from a previous, wider write.
- kmeans_fit returns exactly k centroids even when a cell empties mid-run.
- q60/q61 bucketing floor-divides (negative epochs) instead of truncating.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# events.ts encoding robustness (VERDICT #1/#9)
# ---------------------------------------------------------------------------

_TS_VALUES_US = [
    1704067200_000_000,  # 2024-01-01 00:00:00 UTC
    1704070800_123_456,
    1735689599_999_999,
]


def _events_arrow_table(ts_array: pa.Array) -> pa.Table:
    n = len(ts_array)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )


@pytest.mark.parametrize("encoding", ["micros", "nanos"])
def test_load_table_reads_both_ts_encodings(spark, tmp_path, encoding):
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    if encoding == "micros":
        ts = pa.array(_TS_VALUES_US, pa.timestamp("us"))
    else:
        ts = pa.array([v * 1000 for v in _TS_VALUES_US], pa.timestamp("ns"))
    d = tmp_path / encoding
    d.mkdir()
    pq.write_table(
        _events_arrow_table(ts),
        str(d / "events.parquet"),
        # version 2.6 keeps nanos as TIMESTAMP(NANOS) instead of coercing
        coerce_timestamps=None,
        version="2.6",
    )
    df = load_table(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(r["us"] for r in df.select(F.unix_micros("ts").alias("us")).collect())
    assert got == sorted(_TS_VALUES_US)


def test_load_table_both_encodings_agree(spark, tmp_path):
    """The two encodings of the same instants load to identical values."""
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    dirs = {}
    for enc, arr in (
        ("micros", pa.array(_TS_VALUES_US, pa.timestamp("us"))),
        ("nanos", pa.array([v * 1000 for v in _TS_VALUES_US], pa.timestamp("ns"))),
    ):
        d = tmp_path / enc
        d.mkdir()
        pq.write_table(
            _events_arrow_table(arr), str(d / "events.parquet"), version="2.6"
        )
        dirs[enc] = str(d)
    a = load_table(spark, dirs["micros"], "events").select("event_id", "ts")
    b = load_table(spark, dirs["nanos"], "events").select("event_id", "ts")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# approx_top_k bounded accumulation (VERDICT #5)
# ---------------------------------------------------------------------------


def test_merge_counts_accumulator_stays_bounded():
    from mapreduce_paper_implementation_spark.operators.sketch import (
        _EVICT_FACTOR,
        _merge_counts,
    )

    cap = 50
    acc: dict = {}
    max_seen = 0
    # 200 batches x 100 fresh keys each = 20k distinct keys; plus a stable
    # hot set that must survive every eviction.
    for batch in range(200):
        counts = {f"cold-{batch}-{i}": 1 for i in range(100)}
        counts.update({f"hot-{h:02d}": 10 for h in range(10)})
        _merge_counts(acc, counts, cap)
        max_seen = max(max_seen, len(acc))
    assert max_seen <= _EVICT_FACTOR * cap + 110, max_seen
    hot = {k for k in acc if k.startswith("hot-")}
    assert len(hot) == 10, "hot keys must survive eviction"
    assert acc["hot-00"] == 200 * 10, "hot counts must keep accumulating exactly"


def test_approx_top_k_matches_exact_on_zipf(spark):
    from mapreduce_paper_implementation_spark.operators.sketch import approx_top_k

    # Zipf-ish: key i appears (60 - i) times, i in [0, 60)
    rows = [(f"k{i:02d}",) for i in range(60) for _ in range(60 - i)]
    df = spark.createDataFrame(rows, "tok string").repartition(8)
    got = [(r["tok"], r["cnt"]) for r in approx_top_k(df, "tok", k=5, per_partition=100).collect()]
    assert got == [(f"k{i:02d}", 60 - i) for i in range(5)]


# ---------------------------------------------------------------------------
# textkv overwrite stale parts (VERDICT #6)
# ---------------------------------------------------------------------------


def test_textkv_overwrite_removes_stale_parts(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.textkv_datasource import (
        TextKVDataSource,
    )

    spark.dataSource.register(TextKVDataSource)
    out = str(tmp_path / "kv")
    wide = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(64)], "key string, value string"
    )
    wide.repartition(8).write.format("textkv").mode("overwrite").save(out)
    assert len([f for f in os.listdir(out) if f.startswith("part-")]) == 8

    narrow = spark.createDataFrame(
        [("a", "1"), ("b", "2")], "key string, value string"
    )
    narrow.repartition(2).write.format("textkv").mode("overwrite").save(out)
    parts = [f for f in os.listdir(out) if not f.startswith((".", "_"))]
    assert len(parts) == 2, f"stale parts left behind: {sorted(parts)}"
    back = {(r["key"], r["value"]) for r in spark.read.format("textkv").load(out).collect()}
    assert back == {("a", "1"), ("b", "2")}


def test_textkv_append_does_not_clobber(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.textkv_datasource import (
        TextKVDataSource,
    )

    spark.dataSource.register(TextKVDataSource)
    out = str(tmp_path / "kv")
    one = spark.createDataFrame([("a", "1")], "key string, value string")
    two = spark.createDataFrame([("b", "2")], "key string, value string")
    one.coalesce(1).write.format("textkv").mode("append").save(out)
    two.coalesce(1).write.format("textkv").mode("append").save(out)
    back = {(r["key"], r["value"]) for r in spark.read.format("textkv").load(out).collect()}
    assert back == {("a", "1"), ("b", "2")}


# ---------------------------------------------------------------------------
# kmeans empty-cluster carry-forward (VERDICT #7)
# ---------------------------------------------------------------------------


def test_kmeans_forced_empty_cell_keeps_k_centroids(spark):
    from mapreduce_paper_implementation_spark.operators.kmeans import kmeans_fit

    # Seeds are the vectors of the 3 lowest ids. id0 == id1 == [0,0]: every
    # point ties between cells 1 and 2 and the tiebreak sends all of them to
    # the lower cell, so cell 2 empties on the first assignment.
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [10.0, 10.0]),
        (3, [0.2, 0.1]),
        (4, [0.1, 0.3]),
        (5, [9.8, 10.1]),
        (6, [10.2, 9.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(emb, k=3, max_iter=4)
    out = cents.collect()
    assert len(out) == 3
    assert sorted(r["cell"] for r in out) == [1, 2, 3]
    by_cell = {r["cell"]: r["c_vec"] for r in out}
    # the emptied cell carried its seed forward unchanged
    assert by_cell[2] == [0.0, 0.0]


def test_kmeans_k_larger_than_data_raises(spark):
    from mapreduce_paper_implementation_spark.operators.kmeans import kmeans_fit

    emb = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="only 2 vectors"):
        kmeans_fit(emb, k=5, max_iter=1)


# ---------------------------------------------------------------------------
# floor division vs truncation (VERDICT #8)
# ---------------------------------------------------------------------------


def test_floor_div_matches_python_floor_on_negative_epochs(spark):
    from mapreduce_paper_implementation_spark.plans.pipeline_queries import (
        _HOUR_US,
        _floor_div,
    )

    vals = [
        -7_200_000_001,
        -3_600_000_000,
        -1,
        0,
        1,
        3_599_999_999,
        3_600_000_000,
        1704067200_123_456,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "t_us long")
    got = {
        r["t_us"]: r["bkt"]
        for r in df.select("t_us", _floor_div(F.col("t_us"), _HOUR_US).alias("bkt")).collect()
    }
    for v in vals:
        assert got[v] == v // _HOUR_US, f"{v}: {got[v]} != {v // _HOUR_US}"


def test_q61_buckets_floor_for_pre1970(spark, tmp_path):
    """End-to-end: a pre-1970 event lands in the floor bucket (DuckDB `//`
    semantics). The driver fixture is all-positive so the oracle gate can't
    catch a truncation regression — synthesize a 1969 timestamp."""
    from mapreduce_paper_implementation_spark.plans.pipeline_queries import (
        _BUCKET_S,
        q61_time_rollup,
    )

    t_us = -1_000_001  # 1969-12-31 23:59:58.999999 UTC
    ts = pa.array([t_us, 0, 450_000_000], pa.timestamp("us"))
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(_events_arrow_table(ts), str(d / "events.parquet"), version="2.6")
    rows = q61_time_rollup(spark, str(d)).collect()
    buckets = sorted(r["bucket_epoch_s"] for r in rows)
    expected = sorted(
        {(v // (_BUCKET_S * 1_000_000)) * _BUCKET_S for v in [t_us, 0, 450_000_000]}
    )
    assert buckets == expected, (buckets, expected)


# ---------------------------------------------------------------------------
# incremental rollup maintenance (operators/incremental.py, q69)
# ---------------------------------------------------------------------------


def test_incremental_rollup_equals_oneshot_including_hll(spark, sf_dir):
    """The full contract, sketch column included: a 3-way split of events,
    merged (including a merge-of-merged state to pin re-mergeability and
    schema stability), finalizes bit-identically to the one-shot rollup —
    counts and decimal sums exactly, and the HLL distinct-user estimate too
    (sketch union is lossless over the sketch lattice)."""
    from mapreduce_paper_implementation_spark.operators.incremental import (
        finalize_rollup,
        merge_states,
        rollup_state,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    one_shot = finalize_rollup(rollup_state(ev)).orderBy("bucket_epoch_s", "key")

    parts = [rollup_state(ev.where(F.col("event_id") % 3 == i)) for i in range(3)]
    first_two = merge_states(parts[0], parts[1])
    merged = finalize_rollup(merge_states(first_two, parts[2])).orderBy(
        "bucket_epoch_s", "key"
    )

    # simpleString: dtypes must agree; nullability flags differ between the
    # one-shot and merged plans (outer aggregate) and are not contractual
    assert merged.schema.simpleString() == one_shot.schema.simpleString()
    assert [tuple(r) for r in merged.collect()] == [tuple(r) for r in one_shot.collect()]


def test_rollup_state_size_independent_of_split(spark, sf_dir):
    """State row-count equals |buckets x keys| however the input is split —
    the property that makes merge cost independent of raw-data size."""
    from mapreduce_paper_implementation_spark.operators.incremental import (
        merge_states,
        rollup_state,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    whole = rollup_state(ev)
    merged = merge_states(
        rollup_state(ev.where(F.col("event_id") % 2 == 0)),
        rollup_state(ev.where(F.col("event_id") % 2 == 1)),
    )
    assert merged.count() == whole.count()


# ---------------------------------------------------------------------------
# general catalog schema normalization (CANONICAL_SCHEMAS)
# ---------------------------------------------------------------------------


def test_catalog_normalizes_compatible_drift(spark, tmp_path):
    """A regenerated orders fixture with int32 keys, float32 price and a
    DATE order-date loads to the canonical logical schema."""
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    drifted = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int32()),
            "o_custkey": pa.array([10, 20], pa.int32()),
            "o_orderstatus": pa.array(["O", "F"], pa.string()),
            "o_totalprice": pa.array([1.5, 2.5], pa.float32()),
            "o_orderdate": pa.array([18262, 18263], pa.date32()),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string()),
        }
    )
    pq.write_table(drifted, str(tmp_path / "orders.parquet"))
    df = load_table(spark, str(tmp_path), "orders")
    assert df.schema.simpleString() == (
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
        "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string>"
    )
    rows = sorted(map(tuple, df.collect()))
    assert rows[0][0] == 1 and rows[0][3] == 1.5
    assert rows[0][4].year == 2020  # date 18262 = 2020-01-01, midnight


def test_catalog_rejects_missing_column(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    broken = pa.table({"r_regionkey": pa.array([0], pa.int32())})
    pq.write_table(broken, str(tmp_path / "region.parquet"))
    with pytest.raises(ValueError, match="missing declared columns"):
        load_table(spark, str(tmp_path), "region")


def test_catalog_passes_through_extra_columns(spark, tmp_path):
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    extended = pa.table(
        {
            "r_regionkey": pa.array([0, 1], pa.int64()),
            "r_name": pa.array(["AFRICA", "ASIA"], pa.string()),
            "r_comment": pa.array(["x", "y"], pa.string()),
        }
    )
    pq.write_table(extended, str(tmp_path / "region.parquet"))
    df = load_table(spark, str(tmp_path), "region")
    assert df.columns == ["r_regionkey", "r_name", "r_comment"]
    assert df.schema["r_regionkey"].dataType.simpleString() == "int"


# ---------------------------------------------------------------------------
# incremental near-dup (operators/dedup.py:incremental_neardup, q70)
# ---------------------------------------------------------------------------


def test_incremental_neardup_agrees_with_self_join(spark, sf_dir):
    """Delta-vs-corpus probing must find exactly the cross-parity subset of
    the full self-join's pairs — the index probe loses nothing the all-pairs
    path finds (and adds nothing it doesn't)."""
    from mapreduce_paper_implementation_spark.operators.dedup import (
        incremental_neardup,
        minhash_lsh_pairs,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    full = minhash_lsh_pairs(docs, threshold=0.8)
    expected = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in full.collect()
        if r["id_a"] % 2 != r["id_b"] % 2
    }
    cross = incremental_neardup(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        threshold=0.8,
    )
    got = {
        (min(r["new_id"], r["corpus_id"]), max(r["new_id"], r["corpus_id"]))
        for r in cross.collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# deterministic stratified sampling (operators/sampling.py, q71)
# ---------------------------------------------------------------------------


def test_stratified_sample_exact_k_and_append_stable(spark, sf_dir):
    """Each stratum yields exactly min(k, |stratum|) rows; appending new
    docs only ever replaces incumbents that hash higher — the sample never
    reshuffles wholesale under corpus growth."""
    from mapreduce_paper_implementation_spark.operators.sampling import (
        stratified_sample,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    k = 5
    base = stratified_sample(docs.where(F.col("doc_id") % 4 != 0), "source", "text", k, ("doc_id",))
    sizes = {r["source"]: r["n"] for r in base.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes and all(n <= k for n in sizes.values())

    grown = stratified_sample(docs, "source", "text", k, ("doc_id",))
    base_ids = {(r["source"], r["doc_id"]) for r in base.collect()}
    grown_ids = {(r["source"], r["doc_id"]) for r in grown.collect()}
    # every selection change must be caused by a NEW doc entering, never by
    # two old incumbents swapping
    dropped = base_ids - grown_ids
    entered = grown_ids - base_ids
    new_docs = {(r["source"], r["doc_id"]) for r in docs.where(F.col("doc_id") % 4 == 0).collect()}
    assert entered <= new_docs, "only appended docs may enter the sample"
    assert len(dropped) <= len(entered)
