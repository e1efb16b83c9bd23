"""Release shard exporter (VERDICT r12 ask #2): turn the q127 release cut
from a DataFrame into the on-disk artifact a training loader actually
mounts — per-(split, shard) parquet part files plus a counts/ledger
manifest, committed behind an atomic version pointer.

Layout (the streaming/rollup.py versioned-pointer discipline):

    out_dir/
      v{N}/data/split=train/shard=0/part-*.parquet   hive-partitioned docs
      v{N}/manifest.json                             counts + scrub ledger
      _CURRENT                                       ascii version, atomic

The manifest is the loader's integrity contract: for every (split, shard)
it records n_docs and n_tokens AGGREGATED FROM THE SAME LINEAGE that wrote
the files (plans/release_queries.py:release_cut_frames returns both the
per-doc frame and the scrub ledger; q127's hash-gated output is the same
aggregate), so "manifest counts == files" and "manifest ledger == q127
ledger" hold by construction and are re-read-verified in
tests/test_round13_additions.py.

Scale shape: the data write is one hive-partitioned parquet job — fully
parallel over (split, shard), each task writing its own directory through
Spark's commit protocol (task attempts land in _temporary and are
promoted atomically per job, so a failed executor can never leave a torn
shard). The manifest aggregate is the bounded (splits x shards)-row
groupBy q127 already runs. Driver-side state is only that bounded counts
list. A crash anywhere before the final pointer rename leaves the
previous version as the visible release — readers never observe a
half-written cut.

Reference analog: mr-out-X as the job's real product
(/root/reference/mr-main/mr/worker.go:148-157), done ATOMICALLY — which
the reference's direct os.Create notably is not (worker.go:141-146); the
version pointer is this engine's fix for exactly that gap, same as
sources/textkv_datasource.py's temp-file rename at file grain.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POINTER = "_CURRENT"


def _read_pointer(out_dir: str) -> int | None:
    try:
        with open(os.path.join(out_dir, POINTER), encoding="ascii") as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def export_release(
    perdoc: DataFrame,
    ledger: DataFrame,
    out_dir: str,
    payload: DataFrame | None = None,
) -> int:
    """Write one release version; returns its number.

    `perdoc`: (doc_id, tc, split, shard) — release_cut_frames' assignment.
    `ledger`: the one-row (lex_n, sem_n, tot_n, qual_n) scrub ledger.
    `payload`: optional (doc_id, ...) columns — e.g. the documents table's
    text/source — joined in so the shards carry the training payload, not
    just ids. The join is on the shard assignment's own key, so it cannot
    change the manifest counts (inner join on a superset payload; a doc
    missing from `payload` would drop rows and break the re-read gate —
    the publisher owns that match, same contract as the CC/ANN cuts).

    Order of operations (crash-safe): data parquet -> counts collect ->
    manifest.json -> pointer rename LAST."""
    version = (_read_pointer(out_dir) or 0) + 1
    vdir = os.path.join(out_dir, f"v{version:010d}")

    # perdoc feeds the data write AND the counts aggregate — localCheckpoint
    # so the two consumers read one materialized assignment (the exact
    # boundary-consistency discipline of operators/sort.py:global_rank;
    # also saves recomputing the whole composed cut twice).
    perdoc = perdoc.localCheckpoint(eager=True)
    data = perdoc if payload is None else perdoc.join(payload, "doc_id")
    data.write.mode("overwrite").partitionBy("split", "shard").parquet(
        os.path.join(vdir, "data")
    )

    counts = [
        {
            "split": r["split"],
            "shard": int(r["shard"]),
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
        }
        for r in perdoc.groupBy("split", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tc").cast("long").alias("n_tokens"),
        )
        .orderBy("split", "shard")
        .collect()  # bounded: |splits| x |shards| rows
    ]
    led = ledger.collect()[0].asDict()
    manifest = {
        "version": version,
        "shards": counts,
        "totals": {
            "n_docs": sum(c["n_docs"] for c in counts),
            "n_tokens": sum(c["n_tokens"] for c in counts),
        },
        "ledger": {k: int(v) for k, v in led.items()},
    }
    with open(os.path.join(vdir, "manifest.json"), "w", encoding="ascii") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)

    tmp = os.path.join(out_dir, POINTER + ".tmp")
    with open(tmp, "w", encoding="ascii") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(out_dir, POINTER))
    return version


def read_release(
    spark: SparkSession, out_dir: str
) -> tuple[DataFrame, dict]:
    """Load the CURRENT release version: (docs DataFrame, manifest dict).
    split/shard come back as typed columns (partition values); shard is
    re-cast long to match the writer's schema exactly."""
    version = _read_pointer(out_dir)
    if version is None:
        raise FileNotFoundError(f"no committed release under {out_dir}")
    vdir = os.path.join(out_dir, f"v{version:010d}")
    df = spark.read.parquet(os.path.join(vdir, "data")).withColumn(
        "shard", F.col("shard").cast("long")
    )
    with open(os.path.join(vdir, "manifest.json"), encoding="ascii") as fh:
        manifest = json.load(fh)
    return df, manifest
