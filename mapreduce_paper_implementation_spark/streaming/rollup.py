"""Streaming continuous-aggregate maintenance: the foreachBatch twin of
operators/incremental.py.

Each micro-batch is a delta; the maintainer folds it into a durable state
table (exact decimal count/sum, min/max, HLL user sketch per (bucket, key))
so the serving-side rollup is always one cheap `finalize_rollup` away and
raw history is never re-read. This is the streaming half of the same
contract q69 gates in batch.

Exactly-once without a transactional store, on two disciplines the engine
already uses elsewhere (textkv sink, reference mr/worker.go:157 rename
discipline):

- VERSIONED STATE: batch N writes its merged state to `v{N}`, never in
  place. A crash mid-write leaves `v{N-1}` untouched.
- ATOMIC POINTER, LAST: `_CURRENT` (the committed version number) is
  renamed into place only after the state write completes. foreachBatch is
  at-least-once; a replay of batch N sees the pointer already >= N and
  SKIPS — merging twice would double-count, so idempotence comes from the
  version check, not from the merge.

State size is |buckets| x |keys| regardless of stream volume, so the
per-batch maintenance job is O(|state| + |delta|) — at 100 TB/day the delta
aggregation dominates and history cost stays constant. Old versions are
left for time travel/debugging; production would vacuum `v < CURRENT`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mapreduce_paper_implementation_spark.operators.incremental import (
    merge_states,
    rollup_state,
)


class RollupMaintainer:
    """Durable (bucket, key) rollup state under `state_dir`, updated one
    micro-batch at a time via `update` (a foreachBatch callback).

    The versioned-state/atomic-pointer machinery is state-shape-agnostic:
    pass `state_fn` (delta -> mergeable state frame) and `merge_fn`
    (state, state -> state) to maintain any associative state under the
    same exactly-once discipline — `histogram_maintainer` below uses this
    for the q80 quantile-sketch state (operators/incremental.py §3)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        bucket_s: int = 3600,
        state_fn=None,
        merge_fn=None,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.bucket_s = bucket_s
        self._state_fn = state_fn or (
            lambda delta: rollup_state(delta, bucket_s=self.bucket_s)
        )
        self._merge_fn = merge_fn or merge_states
        os.makedirs(state_dir, exist_ok=True)

    # -- pointer ----------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, "_CURRENT")

    def _committed_version(self) -> int | None:
        try:
            with open(self._pointer_path(), encoding="ascii") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _commit_version(self, version: int) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer_path())  # atomic: commit is the rename

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.state_dir, f"v{version:010d}")

    # -- state ------------------------------------------------------------
    def current_state(self) -> DataFrame | None:
        v = self._committed_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._version_dir(v))

    def update(self, delta: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch of raw events into the state. Idempotent
        under foreachBatch replay: a batch id at or below the committed
        version is a no-op."""
        committed = self._committed_version()
        if committed is not None and committed >= batch_id:
            return
        state = self._state_fn(delta)
        prev = self.current_state()
        if prev is not None:
            state = self._merge_fn(prev, state)
        state.write.mode("overwrite").parquet(self._version_dir(batch_id))
        self._commit_version(batch_id)

    def vacuum(self, keep: int = 1) -> list[int]:
        """Drop superseded state versions, keeping the committed one plus the
        `keep - 1` most recent predecessors. Never touches versions above the
        pointer (an in-flight batch may be writing there). Returns the
        removed version numbers."""
        import shutil

        committed = self._committed_version()
        if committed is None:
            return []
        versions = sorted(
            int(d[1:])
            for d in os.listdir(self.state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )
        keepers = set(v for v in versions if v > committed)  # in-flight
        keepers.update([v for v in versions if v <= committed][-max(keep, 1):])
        removed = []
        for v in versions:
            if v not in keepers:
                shutil.rmtree(self._version_dir(v))
                removed.append(v)
        return removed


def histogram_maintainer(
    spark: SparkSession,
    state_dir: str,
    group_cols=("event_type",),
    value_col: str = "value",
    inv_width: int = 4,
) -> RollupMaintainer:
    """Streaming twin of the q80 histogram-quantile sketch: maintains the
    (group..., bin, cnt) state from operators/incremental.py §3 under the
    versioned exactly-once discipline above. Serving side is
    `quantiles_from_hist(maintainer.current_state(), ...)` — always one
    cheap interpolation away, raw history never re-read; state size is
    O(groups x value_range/width) regardless of stream volume."""
    from mapreduce_paper_implementation_spark.operators.incremental import (
        hist_state,
        merge_hist_states,
    )

    gc = list(group_cols)
    return RollupMaintainer(
        spark,
        state_dir,
        state_fn=lambda delta: hist_state(delta, gc, value_col, inv_width),
        merge_fn=lambda a, b: merge_hist_states([a, b], gc),
    )


def maintain_rollup(
    events_stream: DataFrame, maintainer: RollupMaintainer, checkpoint_dir: str
):
    """Wire a raw event stream into the maintainer. Returns the started
    StreamingQuery; callers drive it (processAllAvailable in tests, just
    run in production)."""
    return (
        events_stream.writeStream.foreachBatch(
            lambda df, batch_id: maintainer.update(df, batch_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
