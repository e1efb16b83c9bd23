#!/usr/bin/env python
"""Budgeted-mixture export + planted-skew bench (VERDICT r13 ask #1).

Two claims are priced into BENCH_MIXTURE.json:

1. EXPORT: the end-to-end mixture materialization (q133 plan -> q134
   repetition schedule -> token-balanced (epoch, shard) files + manifest
   behind the atomic pointer) at sf0.1 — the write-side cost next to the
   standing q134/q136 read rows.

2. SKEW: the design rationale of the ONE-global-prefix_sum formulation.
   On a corpus where one source is remapped to hold >=50% of all tokens
   (deterministic doc_id%10<6 remap of the x10/x30 scale corpora), the
   engine's q134 per-source offsets still ride the range exchange
   (operators/sort.py:prefix_sum — every stage parallel over range
   partitions), while the NAIVE formulation — `SUM(tc) OVER (PARTITION BY
   source ORDER BY k, doc_id)` — funnels the dominant source into ONE
   window task. Both are timed on the same skewed corpus and must return
   IDENTICAL rows; the engine path must also hold its wall time vs the
   UNSKEWED corpus at the same scale (skew-insensitivity), which is the
   property that matters at 100 TB where the dominant source does not fit
   one task at all.

Run SOLO (the bench discipline): python scripts/bench_mixture_skew.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreduce_paper_implementation_spark.operators.caching import (  # noqa: E402
    free_local_checkpoints,
    release_persisted,
)
from mapreduce_paper_implementation_spark.session import get_spark  # noqa: E402

DOM = "src00dominant"  # sorts below 'src2' -> 1-epoch cap class


def skewed(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 10 < 6, F.lit(DOM)).otherwise(F.col("source")),
    )


def _drain(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def naive_q134(docs: DataFrame) -> DataFrame:
    """q134 with the per-source WINDOW cumsum (the oracle's sf0.01 truth
    formulation) — correct, but the dominant source lands in one task."""
    from mapreduce_paper_implementation_spark.functions.text import token_count
    from mapreduce_paper_implementation_spark.plans.release_queries import (
        _mixture_alloc_frame,
    )

    alloc = _mixture_alloc_frame(docs).select(
        "source",
        F.expr("allocated div toks").cast("long").alias("full_epochs"),
        F.expr("allocated % toks").cast("long").alias("rem"),
        "allocated",
    )
    base = docs.select(
        "doc_id", "source", token_count("text").cast("long").alias("tc")
    ).withColumn("k", F.md5(F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("source")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scum = base.withColumn(
        "scum", F.coalesce(F.sum("tc").over(w), F.lit(0)).cast("long")
    )
    persrc = (
        scum.join(F.broadcast(alloc), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_src_docs"),
            F.sum("tc").cast("long").alias("toks"),
            F.sum(F.when(F.col("scum") < F.col("rem"), 1).otherwise(0))
            .cast("long")
            .alias("head_docs"),
            F.sum(F.when(F.col("scum") < F.col("rem"), F.col("tc")).otherwise(0))
            .cast("long")
            .alias("head_tokens"),
            F.max("full_epochs").alias("full_epochs"),
            F.max("allocated").alias("allocated"),
        )
    )
    kept_docs = (
        F.col("full_epochs") * F.col("n_src_docs") + F.col("head_docs")
    ).cast("long")
    kept_toks = (
        F.col("full_epochs") * F.col("toks") + F.col("head_tokens")
    ).cast("long")
    return persrc.select(
        "source",
        kept_docs.alias("n_docs_kept"),
        kept_toks.alias("n_tokens_kept"),
        "allocated",
        "full_epochs",
        F.round(kept_toks / F.col("allocated"), 6).alias("utilization"),
    ).orderBy("source")


def engine_q134(docs: DataFrame) -> DataFrame:
    from mapreduce_paper_implementation_spark.plans.release_queries import (
        _mixture_sample_parts,
    )

    scum, alloc = _mixture_sample_parts(docs)
    persrc = (
        scum.join(F.broadcast(alloc), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_src_docs"),
            F.sum("tc").cast("long").alias("toks"),
            F.sum(F.when(F.col("scum") < F.col("rem"), 1).otherwise(0))
            .cast("long")
            .alias("head_docs"),
            F.sum(F.when(F.col("scum") < F.col("rem"), F.col("tc")).otherwise(0))
            .cast("long")
            .alias("head_tokens"),
            F.max("full_epochs").alias("full_epochs"),
            F.max("allocated").alias("allocated"),
        )
    )
    kept_docs = (
        F.col("full_epochs") * F.col("n_src_docs") + F.col("head_docs")
    ).cast("long")
    kept_toks = (
        F.col("full_epochs") * F.col("toks") + F.col("head_tokens")
    ).cast("long")
    return persrc.select(
        "source",
        kept_docs.alias("n_docs_kept"),
        kept_toks.alias("n_tokens_kept"),
        "allocated",
        "full_epochs",
        F.round(kept_toks / F.col("allocated"), 6).alias("utilization"),
    ).orderBy("source")


def best_of(fn, docs, spark, repeat=2) -> float:
    best = None
    for _ in range(repeat):
        dt = _drain(fn(docs))
        best = dt if best is None else min(best, dt)
        release_persisted()
        spark.catalog.clearCache()
        free_local_checkpoints(spark)
    return best


def main() -> None:
    spark = get_spark("bench-mixture")
    out: dict = {"doc": __doc__.splitlines()[0], "export": {}, "skew": {}}

    # ---- 1. export at sf0.1 ------------------------------------------------
    from mapreduce_paper_implementation_spark.sources.mixture_export import (
        export_mixture,
        read_mixture,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    docs01 = load_table(spark, "/root/testdata/sf0.1", "documents")
    exp_dir = os.path.join(tempfile.gettempdir(), "spark_graft_mixture_bench")
    shutil.rmtree(exp_dir, ignore_errors=True)
    t0 = time.perf_counter()
    export_mixture(spark, docs01, exp_dir, payload=docs01.select("doc_id", "text"))
    wall = round(time.perf_counter() - t0, 3)
    _, manifest = read_mixture(spark, exp_dir)
    out["export"] = {
        "sf": 0.1,
        "wall_sec": wall,
        "n_docs": manifest["totals"]["n_docs"],
        "n_tokens": manifest["totals"]["n_tokens"],
        "n_partitions": len(manifest["shards"]),
    }
    shutil.rmtree(exp_dir, ignore_errors=True)
    release_persisted()
    spark.catalog.clearCache()
    free_local_checkpoints(spark)

    # ---- 2. planted skew at x10/x30 ---------------------------------------
    for tier in ("x10", "x30"):
        ddir = os.path.join(REPO, "scale_data", tier, "documents.parquet")
        if not os.path.exists(ddir):
            continue
        docs = spark.read.parquet(ddir)
        sk = skewed(docs)
        share = (
            sk.groupBy("source")
            .agg(F.sum(F.length("text")).alias("c"))
            .withColumn("tot", F.sum("c").over(Window.partitionBy()))
            .where(F.col("source") == DOM)
            .select((F.col("c") / F.col("tot")).alias("s"))
            .collect()[0]["s"]
        )
        eng_skew = best_of(engine_q134, sk, spark)
        nai_skew = best_of(naive_q134, sk, spark)
        eng_flat = best_of(engine_q134, docs, spark)
        same = sorted(map(tuple, engine_q134(sk).collect())) == sorted(
            map(tuple, naive_q134(sk).collect())
        )
        release_persisted()
        spark.catalog.clearCache()
        free_local_checkpoints(spark)
        out["skew"][tier] = {
            "n_docs": docs.count(),
            "dominant_token_share": round(float(share), 3),
            "engine_skewed_sec": eng_skew,
            "naive_window_skewed_sec": nai_skew,
            "engine_unskewed_sec": eng_flat,
            "rows_identical": bool(same),
            "skew_insensitivity": round(eng_skew / eng_flat, 3),
            "naive_vs_engine": round(nai_skew / eng_skew, 3),
        }
        print(tier, out["skew"][tier], flush=True)

    # ---- 3. the scan primitive at a scale where the window task IS the
    # job. At 50-150k docs tokenization dominates and the naive per-source
    # window is not yet the bottleneck (the x10/x30 rows above measure
    # that honestly: ratios ~1). The 100-TB claim is about the SHAPE —
    # the dominant source lands in ONE window task — so this section
    # isolates the primitive on a 20M-row skewed frame (60% one key, no
    # tokenization) and also records the structural metric directly: the
    # largest single-task slice each formulation sorts.
    n = 20_000_000
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 6, F.lit(DOM))
            .otherwise(F.concat(F.lit("src"), (F.col("id") % 20).cast("string")))
            .alias("source"),
            (F.col("id") % 997 + 1).cast("long").alias("tc"),
        )
        .withColumn("k", F.md5(F.col("doc_id").cast("string")))
    )

    def prim_engine(df):
        from mapreduce_paper_implementation_spark.operators.sort import prefix_sum

        cum = prefix_sum(df, [F.col("source"), F.col("k"), F.col("doc_id")], "tc")
        offs = cum.groupBy("source").agg(F.min("cum_before").alias("_soff"))
        return cum.join(F.broadcast(offs), "source").select(
            "doc_id", (F.col("cum_before") - F.col("_soff")).alias("scum")
        )

    def prim_naive(df):
        w = (
            Window.partitionBy("source")
            .orderBy("k", "doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.select(
            "doc_id",
            F.coalesce(F.sum("tc").over(w), F.lit(0)).cast("long").alias("scum"),
        )

    eng = best_of(prim_engine, base, spark)
    nai = best_of(prim_naive, base, spark)
    # structural metric: rows in the largest slice a single task must sort
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    eng_max = (
        base.repartitionByRange(n_parts, F.col("source"), F.col("k"), F.col("doc_id"))
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    nai_max = (
        base.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    )
    out["primitive_20M"] = {
        "n_rows": n,
        "dominant_share": 0.6,
        "engine_prefix_sum_sec": eng,
        "naive_window_sec": nai,
        "naive_vs_engine": round(nai / eng, 3),
        "engine_max_task_rows": int(eng_max),
        "naive_max_task_rows": int(nai_max),
    }
    print("primitive_20M", out["primitive_20M"], flush=True)

    with open(os.path.join(REPO, "BENCH_MIXTURE.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
