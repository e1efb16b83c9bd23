"""Sink round-trips + reference text-format compatibility."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.sources.sinks import (
    write_csv,
    write_json,
    write_parquet,
    write_text_kv,
)
from mapreduce_paper_implementation_spark.sources.tables import load_table


def _wc(spark, sf_dir):
    from mapreduce_paper_implementation_spark.plans.queries import QUERIES

    return QUERIES["q01_wordcount"](spark, sf_dir)


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_parq")
    write_parquet(src, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    # hive-style partition dirs exist -> partition pruning is available
    assert glob.glob(os.path.join(out, "o_orderstatus=*"))
    # pruned read only touches one directory
    one = back.where(F.col("o_orderstatus") == "F")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    for writer, fmt in [(write_csv, "csv"), (write_json, "json")]:
        out = str(tmp_path / f"region_{fmt}")
        writer(src, out)
        if fmt == "csv":
            back = spark.read.option("header", True).csv(out, inferSchema=True)
        else:
            back = spark.read.json(out)
        assert sorted(r["r_name"] for r in back.collect()) == sorted(
            r["r_name"] for r in src.collect()
        )


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    # ORC is the remaining built-in columnar format; same predicate-pushdown
    # contract as parquet
    src = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in src.collect()
    )
    plan = (
        back.where(F.col("n_regionkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan


def test_text_kv_reference_format(spark, sf_dir, tmp_path):
    wc = _wc(spark, sf_dir).withColumnRenamed("token", "key").withColumnRenamed("cnt", "value")
    out = str(tmp_path / "mr_out")
    write_text_kv(wc, out, n_files=10)
    parts = sorted(glob.glob(os.path.join(out, "part-*")))
    # Spark's writer skips empty partitions (the reference pre-creates empty
    # mr-out files instead, coordinator.go:243-255) — bound, not equality.
    assert 1 <= len(parts) <= 10
    # sorted union of lines == sorted "key value" truth (test-mr.sh:58 rule)
    lines = []
    for p in parts:
        with open(p) as f:
            lines += [ln.rstrip("\n") for ln in f if ln.strip()]
    want = [f"{r['key']} {r['value']}" for r in wc.collect()]
    assert sorted(lines) == sorted(want)
    # same key never lands in two files (hash-partitioned by key,
    # the ihash%nReduce contract of mr/worker.go:86-89)
    seen: dict[str, str] = {}
    for p in parts:
        with open(p) as f:
            for ln in f:
                k = ln.split(" ", 1)[0]
                assert seen.setdefault(k, p) == p


def test_binary_file_source_feeds_multimodal_decode(spark, tmp_path):
    """binaryFile ingestion: whole file = one record (the reference's input
    model, mr/worker.go:58-70, generalized to blobs), normalized to the
    media schema and run through the Arrow-batched decode."""
    from mapreduce_paper_implementation_spark.operators.multimodal import decode_media
    from mapreduce_paper_implementation_spark.sources.binary_files import (
        read_binary_dir,
        to_media_table,
    )

    src = tmp_path / "blobs" / "cam0"
    src.mkdir(parents=True)
    payloads = {i: bytes([i]) * (10 + i) for i in range(5)}
    for i, p in payloads.items():
        (src / f"{i}.bin").write_bytes(p)
    (src / "notes.txt").write_text("not a blob")

    files = read_binary_dir(spark, str(tmp_path / "blobs"), glob="*.bin")
    media = to_media_table(files)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert set(rows) == set(payloads)
    assert all(r["source"] == "cam0" for r in rows.values())
    assert bytes(rows[3]["media"]) == payloads[3]

    decoded = {r["doc_id"]: r for r in decode_media(media).collect()}
    assert decoded[4]["byte_len"] == 14
    assert decoded[4]["n_frames"] >= 1


def test_textkv_datasource_roundtrip_with_reference_sink(spark, sf_dir, tmp_path):
    """Custom Python DataSource (Spark 4 API): the reference's 'key value'
    text format as a first-class readable+writable format. Round trip 1:
    write_text_kv sink output read back via .format('textkv'). Round trip 2:
    dataframe -> .write.format('textkv') -> read -> identical. One reader
    partition per part file (the reference's one-task-per-file model)."""
    from mapreduce_paper_implementation_spark.plans.queries import QUERIES
    from mapreduce_paper_implementation_spark.sources.sinks import write_text_kv
    from mapreduce_paper_implementation_spark.sources.textkv_datasource import (
        TextKVDataSource,
    )
    from pyspark.sql import functions as F

    spark.dataSource.register(TextKVDataSource)

    wc = QUERIES["q01_wordcount"](spark, sf_dir).select(
        F.col("token").alias("key"), F.col("cnt").cast("string").alias("value")
    )
    want = {(r["key"], r["value"]) for r in wc.collect()}

    # reference sink -> custom source
    out1 = str(tmp_path / "kv_sink")
    write_text_kv(wc, out1, n_files=4)
    back1 = spark.read.format("textkv").load(out1)
    assert {(r["key"], r["value"]) for r in back1.collect()} == want
    # one reader partition per part file
    assert back1.rdd.getNumPartitions() == 4

    # custom writer -> custom source
    out2 = str(tmp_path / "kv_writer")
    wc.repartition(3).write.format("textkv").mode("overwrite").save(out2)
    import os
    parts = [f for f in os.listdir(out2) if f.startswith("part-")]
    assert len(parts) == 3
    assert not [f for f in os.listdir(out2) if f.endswith(".tmp")]
    back2 = spark.read.format("textkv").load(out2)
    assert {(r["key"], r["value"]) for r in back2.collect()} == want


def test_textkv_datasource_values_with_spaces(spark, tmp_path):
    """Split on the FIRST space only: multi-field values (crash app shape,
    mrapps/crash.go:50-56) survive the round trip."""
    from mapreduce_paper_implementation_spark.sources.textkv_datasource import (
        TextKVDataSource,
    )

    spark.dataSource.register(TextKVDataSource)
    rows = [("a", "1 2 3"), ("b", ""), ("c d", "x")]  # note: key 'c d' writes as 'c d x'
    df = spark.createDataFrame(rows, "key string, value string")
    out = str(tmp_path / "kv_spaces")
    df.coalesce(1).write.format("textkv").mode("overwrite").save(out)
    got = {(r["key"], r["value"]) for r in spark.read.format("textkv").load(out).collect()}
    # 'c d x' reads back as key='c', value='d x' — first-space semantics,
    # matching how the reference's sort|cmp comparison treats lines
    assert ("a", "1 2 3") in got
    assert ("b", "") in got
    assert ("c", "d x") in got
