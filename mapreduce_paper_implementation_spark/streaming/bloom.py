"""Materialized seen-keys maintenance: the stateful half of
operators/membership.py:seen_membership.

A daily ingest pipeline asks "which of this batch's keys has history
already seen?" every run. Rebuilding the history Bloom filter per run
re-scans history; this maintainer persists the filter once and grows it
per batch. The Bloom word-map representation (word -> int64 bitmask) makes
growth ASSOCIATIVE: the filter of (A union B) is the per-word BIT_OR of the
filters of A and B, so a batch contributes a tiny word-map delta and the
merged filter is one groupBy(word).BIT_OR away — no key ever needs
re-hashing. The exact key store grows alongside it so bloom-positive keys
can be verified exactly (operators/membership.py removes the
false-positive sliver; false negatives cannot exist).

    state_dir/
      baseline/g{N}/filter/   compacted word map through batch N
      baseline/g{N}/keys/     compacted distinct key store through batch N
      batches/b{N}/filter/    the batch's own word-map delta
      batches/b{N}/keys/      the batch's distinct keys
      seen/b{N}/              the batch rows tagged `seen` (the answer)
      _CURRENT, _BASELINE     atomic pointers (rename-published)

Same idempotence discipline as streaming/rollup.py and
streaming/dedup_index.py: all writes go to batch-id-keyed dirs (a replayed
batch overwrites its own dirs), the pointer moves only after every write,
and a batch id at or below the pointer is a no-op returning the persisted
answer. compact() folds deltas into a baseline generation so probe cost is
O(1) dirs regardless of batch count.

At 100 TB the word map stays <= num_bits/64 rows forever (size it for the
projected key cardinality up front, or retrain-style rebuild at a larger
num_bits when the fill factor passes ~50 % — rebuild cost is one scan of
the compacted key store, not of history's raw data); the key store is the
only state that grows with history, and only bloom-positive keys ever join
it.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.membership import (
    DEFAULT_NUM_BITS,
    DEFAULT_NUM_HASHES,
    DEFAULT_SEED,
    bloom_maybe_seen,
    build_bloom,
)


class SeenKeysMaintainer:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_cols: Sequence[str],
        *,
        num_bits: int = DEFAULT_NUM_BITS,
        num_hashes: int = DEFAULT_NUM_HASHES,
        seed: int = DEFAULT_SEED,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.key_cols = list(key_cols)
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.seed = seed
        os.makedirs(os.path.join(state_dir, "batches"), exist_ok=True)

    # -- pointers (same discipline as streaming/dedup_index.py) ------------
    def _pointer(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    @staticmethod
    def _read_pointer(path: str) -> int | None:
        try:
            with open(path, encoding="ascii") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    @staticmethod
    def _write_pointer(path: str, version: int) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(str(version))
        os.replace(tmp, path)

    def _batch_dir(self, batch_id: int, leaf: str) -> str:
        return os.path.join(self.state_dir, "batches", f"b{batch_id:010d}", leaf)

    def _baseline_dir(self, version: int, leaf: str) -> str:
        return os.path.join(self.state_dir, "baseline", f"g{version:010d}", leaf)

    def _committed_dirs(self, leaf: str) -> list[str]:
        committed = self._read_pointer(self._pointer("_CURRENT"))
        if committed is None:
            return []
        baseline = self._read_pointer(self._pointer("_BASELINE"))
        dirs: list[str] = []
        if baseline is not None:
            dirs.append(self._baseline_dir(baseline, leaf))
        floor = baseline if baseline is not None else -1
        root = os.path.join(self.state_dir, "batches")
        dirs += [
            os.path.join(root, d, leaf)
            for d in sorted(os.listdir(root))
            if d.startswith("b") and d[1:].isdigit() and floor < int(d[1:]) <= committed
        ]
        return dirs

    # -- state -------------------------------------------------------------
    def filter(self) -> DataFrame | None:
        """The merged history Bloom filter: per-word BIT_OR over every
        committed delta — the associative merge that makes per-batch
        maintenance possible. <= num_bits/64 rows by construction."""
        dirs = self._committed_dirs("filter")
        if not dirs:
            return None
        return (
            self.spark.read.parquet(*dirs)
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        )

    def keys(self) -> DataFrame | None:
        dirs = self._committed_dirs("keys")
        return self.spark.read.parquet(*dirs) if dirs else None

    # -- per-batch maintenance --------------------------------------------
    def update(self, batch: DataFrame, batch_id: int) -> DataFrame | None:
        """Tag `batch` rows with `seen` (vs all history committed BEFORE this
        batch), persist the answer and the batch's filter/key deltas, and
        advance the pointer. Replays of a committed batch id are no-ops
        returning the persisted answer."""
        committed = self._read_pointer(self._pointer("_CURRENT"))
        seen_dir = os.path.join(self.state_dir, "seen", f"b{batch_id:010d}")
        if committed is not None and committed >= batch_id:
            return self.spark.read.parquet(seen_dir)
        hist_filter = self.filter()
        batch_keys = batch.select(*self.key_cols).distinct()
        if hist_filter is None:
            flags = batch_keys.select(*self.key_cols, F.lit(False).alias("seen"))
        else:
            maybe = bloom_maybe_seen(
                batch_keys,
                hist_filter,
                self.key_cols,
                num_bits=self.num_bits,
                num_hashes=self.num_hashes,
                seed=self.seed,
            )
            pos_keys = maybe.where(F.col("bloom_maybe")).select(*self.key_cols)
            # The key store holds one distinct-key set PER DELTA, so a key
            # seen in several batches appears several times before compact();
            # a plain left join against it would duplicate flag rows. Semi-
            # join the store against the (small) positive set and distinct
            # the matches instead — history is scanned map-side, never
            # shuffled or deduplicated wholesale.
            matched = self.keys().join(pos_keys, self.key_cols, "left_semi").distinct()
            positives = pos_keys.join(
                matched.withColumn("_h", F.lit(True)), self.key_cols, "left"
            ).select(*self.key_cols, F.coalesce("_h", F.lit(False)).alias("seen"))
            flags = (
                maybe.where(~F.col("bloom_maybe"))
                .select(*self.key_cols, F.lit(False).alias("seen"))
                .unionByName(positives)
            )
        tagged = batch.join(flags, self.key_cols, "left").withColumn(
            "seen", F.coalesce("seen", F.lit(False))  # NULL keys: not seen
        )
        tagged.write.mode("overwrite").parquet(seen_dir)
        build_bloom(
            batch_keys,
            self.key_cols,
            num_bits=self.num_bits,
            num_hashes=self.num_hashes,
            seed=self.seed,
        ).write.mode("overwrite").parquet(self._batch_dir(batch_id, "filter"))
        batch_keys.write.mode("overwrite").parquet(self._batch_dir(batch_id, "keys"))
        self._write_pointer(self._pointer("_CURRENT"), batch_id)
        return self.spark.read.parquet(seen_dir)

    # -- compaction --------------------------------------------------------
    def compact(self) -> int | None:
        """Fold committed filter deltas (BIT_OR) and key deltas (distinct)
        into one baseline generation; truncate the delta chain. Idempotent
        and crash-safe by the two-phase pointer discipline."""
        committed = self._read_pointer(self._pointer("_CURRENT"))
        if committed is None:
            return None
        if self._read_pointer(self._pointer("_BASELINE")) == committed:
            return committed
        merged_filter = (
            self.spark.read.parquet(*self._committed_dirs("filter"))
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        )
        merged_filter.write.mode("overwrite").parquet(
            self._baseline_dir(committed, "filter")
        )
        self.spark.read.parquet(*self._committed_dirs("keys")).distinct().write.mode(
            "overwrite"
        ).parquet(self._baseline_dir(committed, "keys"))
        self._write_pointer(self._pointer("_BASELINE"), committed)
        root = os.path.join(self.state_dir, "batches")
        for d in os.listdir(root):
            if d.startswith("b") and d[1:].isdigit() and int(d[1:]) <= committed:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        base_root = os.path.join(self.state_dir, "baseline")
        for d in os.listdir(base_root):
            if d.startswith("g") and d[1:].isdigit() and int(d[1:]) < committed:
                shutil.rmtree(os.path.join(base_root, d), ignore_errors=True)
        return committed


def maintain_seen_keys(
    stream_df: DataFrame, maintainer: SeenKeysMaintainer, checkpoint_dir: str
):
    """Wire a raw record stream into the maintainer (foreachBatch, same
    pattern as streaming/rollup.py:maintain_rollup). Each micro-batch is
    tagged against all history committed before it and appended; replays of
    a committed epoch are no-ops by the pointer discipline, so at-least-once
    delivery yields exactly-once state. Returns the started StreamingQuery."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, batch_id: maintainer.update(df, batch_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
