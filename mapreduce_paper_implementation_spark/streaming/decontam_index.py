"""Streaming semantic-decontamination serving — q116's incremental twin
(VERDICT r10 ask #3).

The batch query (operators/dedup.py:semantic_decontaminate) gates the WHOLE
corpus against the eval slice in one shot. In production the eval set is
small and static per benchmark release while corpus batches arrive daily —
so the serving shape is: freeze the trained centroids and the cell-assigned
eval index ONCE per release (the streaming/ann_index.py frozen-centroid
discipline), then score each arriving batch map-side against the broadcast
eval index and fold the per-batch contaminated-doc DELTA into versioned
state. Because each vector's verdict depends only on itself and the frozen
eval index (operators/dedup.py:decontam_probe — the exact code path batch
q116 runs), union-over-batches equals the one-shot result BIT-exactly,
which the differential test pins (tests/test_decontam_index.py).

State layout (the ann_index/rollup pointer discipline — versioned writes,
atomic pointer rename LAST, replayed batches no-op):

- ``batches/b{N}/cells``  — the batch's cell-assigned vectors
  (id, cell, vec, nrm): the retrain() input. Append-only per batch; never
  rewritten, so per-batch ingest cost is O(|batch|), never O(history).
- ``contam/v{N}``         — cumulative (vec_id, n_eval_hits, max_eval_cos).
  Each version = previous ∪ the new batch's delta (batches are vec-disjoint
  by the additive-maintainer precondition; a replayed batch id no-ops via
  the committed-batch check, like every RollupMaintainer).
- ``eval/g{N}``           — the cell-assigned eval index generation.

The commit pointer ``_CURRENT`` holds BOTH the last ingested batch id (the
replay/idempotence check) and the contam state version (which retrain()
bumps independently of batch ids) — one file, one atomic rename, so a
crash can never commit one without the other.

retrain(new_eval, gen) — the eval set was RE-RELEASED: build the new
eval-index generation under the SAME frozen centroids (re-clustering the
corpus is ann_index.retrain's job, deliberately out of scope here) and
re-probe the ENTIRE maintained cells store against it, REPLACING the
contaminated state. Cost is O(|stored corpus assignments|) with zero
corpus re-read — the assignments ARE the state, exactly why they are kept.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DecontamIndexMaintainer:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        centroids: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        nassign: int = 2,
        threshold: float = 0.35,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.nassign = nassign
        self.threshold = threshold
        os.makedirs(os.path.join(state_dir, "batches"), exist_ok=True)
        cdir = os.path.join(state_dir, "centroids")
        if not os.path.exists(cdir):
            # frozen at construction: every batch and every eval generation
            # must share cell boundaries or stored assignments go stale
            centroids.write.mode("overwrite").parquet(cdir)

    # -- pointers (rollup.py discipline; _CURRENT carries two ints) ---------
    def _ptr(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _committed(self) -> tuple[int, int] | None:
        """(last ingested batch id, contam state version) or None."""
        try:
            with open(self._ptr("_CURRENT"), encoding="ascii") as fh:
                batch_id, cver = fh.read().split()
                return int(batch_id), int(cver)
        except FileNotFoundError:
            return None

    def _commit(self, batch_id: int, cver: int) -> None:
        tmp = self._ptr("_CURRENT") + ".tmp"
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(f"{batch_id} {cver}")
        os.replace(tmp, self._ptr("_CURRENT"))

    def _eval_gen(self) -> int | None:
        try:
            with open(self._ptr("_EVAL"), encoding="ascii") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _cells_dir(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, "batches", f"b{batch_id:010d}", "cells")

    def _contam_dir(self, version: int) -> str:
        return os.path.join(self.state_dir, "contam", f"v{version:010d}")

    def _eval_dir(self, gen: int) -> str:
        return os.path.join(self.state_dir, "eval", f"g{gen:010d}")

    # -- index pieces --------------------------------------------------------
    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.state_dir, "centroids"))

    def _assign(self, emb: DataFrame) -> DataFrame:
        """(id, cell, vec, nrm) under the frozen centroids — the IDENTICAL
        assign_cells + norm path one-shot q116 runs, so stored batch
        assignments and the eval index can never drift from batch cell
        boundaries."""
        from mapreduce_paper_implementation_spark.functions.vectors import norm
        from mapreduce_paper_implementation_spark.operators.dedup import assign_cells

        return assign_cells(
            emb, self.centroids(), nassign=self.nassign,
            id_col=self.id_col, vec_col=self.vec_col,
        ).withColumn("nrm", norm(F.col("vec")))

    def set_eval(self, eval_emb: DataFrame, gen: int) -> None:
        """Install eval-index generation `gen` (a benchmark release): cell-
        assign the eval vectors under the frozen centroids and store the
        broadcastable (cell, eval_id, e_vec, e_nrm) index."""
        ev = self._assign(eval_emb).select(
            "cell",
            F.col("id").alias("eval_id"),
            F.col("vec").alias("e_vec"),
            F.col("nrm").alias("e_nrm"),
        )
        ev.write.mode("overwrite").parquet(self._eval_dir(gen))
        tmp = self._ptr("_EVAL") + ".tmp"
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(str(gen))
        os.replace(tmp, self._ptr("_EVAL"))

    def eval_index(self) -> DataFrame:
        gen = self._eval_gen()
        if gen is None:
            raise ValueError("no eval generation installed; call set_eval first")
        return self.spark.read.parquet(self._eval_dir(gen))

    def cells(self) -> DataFrame | None:
        committed = self._committed()
        if committed is None:
            return None
        last_batch, _ = committed
        root = os.path.join(self.state_dir, "batches")
        dirs = [
            os.path.join(root, d, "cells")
            for d in sorted(os.listdir(root))
            if d.startswith("b") and d[1:].isdigit() and int(d[1:]) <= last_batch
        ]
        return self.spark.read.parquet(*dirs) if dirs else None

    # -- ingest ----------------------------------------------------------------
    def update(self, batch_emb: DataFrame, batch_id: int) -> None:
        """Fold one corpus batch: assign cells (frozen centroids), probe
        map-side vs the broadcast eval index (decontam_probe — the batch
        q116 code path), append the assignment delta, fold the
        contaminated delta into versioned state. O(|batch|): history is
        never re-read. Idempotent under replay via the committed batch id.
        PRECONDITION (like every additive maintainer): batches partition
        vectors disjointly."""
        from mapreduce_paper_implementation_spark.operators.caching import (
            persist_scope,
            scoped_persist,
        )
        from mapreduce_paper_implementation_spark.operators.dedup import (
            decontam_probe,
        )

        committed = self._committed()
        if committed is not None and committed[0] >= batch_id:
            return
        cver = committed[1] + 1 if committed is not None else 0
        with persist_scope():
            # two consumers (cells write + probe) — persist the assignment
            assigned = scoped_persist(self._assign(batch_emb))
            assigned.write.mode("overwrite").parquet(self._cells_dir(batch_id))
            delta = decontam_probe(assigned, self.eval_index(), self.threshold)
            prev = self.contaminated()
            state = delta if prev is None else prev.unionByName(delta)
            state.write.mode("overwrite").parquet(self._contam_dir(cver))
        self._commit(batch_id, cver)

    # -- serving -----------------------------------------------------------------
    def contaminated(self) -> DataFrame | None:
        committed = self._committed()
        if committed is None:
            return None
        return self.spark.read.parquet(self._contam_dir(committed[1]))

    def serve(self) -> DataFrame | None:
        """q116's output shape from maintained state."""
        c = self.contaminated()
        return None if c is None else c.orderBy("vec_id")

    def vacuum(self, keep: int = 1) -> list[int]:
        """Drop superseded contam versions (the cells store is the index —
        never vacuumed here). Mirrors RollupMaintainer.vacuum: keeps the
        committed version plus keep-1 predecessors, never touches versions
        above the pointer."""
        import shutil

        committed = self._committed()
        if committed is None:
            return []
        _, cver = committed
        root = os.path.join(self.state_dir, "contam")
        if not os.path.exists(root):
            return []
        versions = sorted(
            int(d[1:]) for d in os.listdir(root) if d.startswith("v") and d[1:].isdigit()
        )
        keepers = set(v for v in versions if v > cver)
        keepers.update([v for v in versions if v <= cver][-max(keep, 1):])
        removed = []
        for v in versions:
            if v not in keepers:
                shutil.rmtree(self._contam_dir(v))
                removed.append(v)
        return removed

    # -- eval re-release --------------------------------------------------------
    def retrain(self, new_eval_emb: DataFrame, gen: int) -> None:
        """The eval set was re-released: install the new eval-index
        generation and re-score the ENTIRE maintained assignment store
        against it, replacing the contaminated state — O(state), zero
        corpus re-read. Future update() batches probe the new generation
        automatically (the pointer moved)."""
        from mapreduce_paper_implementation_spark.operators.dedup import (
            decontam_probe,
        )

        committed = self._committed()
        self.set_eval(new_eval_emb, gen)
        if committed is None:
            return
        last_batch, cver = committed
        rescored = decontam_probe(self.cells(), self.eval_index(), self.threshold)
        rescored.write.mode("overwrite").parquet(self._contam_dir(cver + 1))
        self._commit(last_batch, cver + 1)
