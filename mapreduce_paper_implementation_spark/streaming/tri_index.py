"""Incremental triangle counting: the materialized streaming twin of
operators/graph.py:count_triangles (q87).

A link graph arrives batch by batch (crawl frontier expansion, event-graph
ingest); rebuilding per-node triangle counts from ALL historical edges per
batch is O(corpus wedges). This maintainer keeps the counts materialized
and folds each edge batch in with O(|delta| x avg common-neighborhood)
compute and O(|delta|) WRITES — history is read (map-side scan of the edge
chain, no shuffle of history), never rewritten:

1. Canonicalize the batch (undirected a<b, self-loops/multiplicity
   dropped) and anti-join the committed edge chain — only truly-NEW edges
   participate (re-posted edges create no triangles).
2. Every triangle gained contains >= 1 new edge, so enumerate per new edge
   (a, b): common neighbors c with (a, c) AND (b, c) in the UNION graph
   (chain + this batch — a triangle of 2-3 new edges closes within the
   batch). A triangle with j new edges is enumerated j times; a DISTINCT
   over the canonical sorted triple (x < y < z) restores exactly-once.
   Both probes are equi-joins of the small delta against the edge chain —
   Spark broadcasts the delta, the chain never shuffles; at 100 TB the
   baseline generation is bucketed by endpoint and the probes co-locate.
3. Credit the 3 vertices of each gained triangle and persist ONLY the
   per-node increments (node, d_tri). Counts are served as the sum of the
   committed increment chain — addition is associative (the rollup.py
   property), so increments ARE the state; compact() folds chain + edges
   into one baseline generation under the dedup_index.py two-pointer
   discipline, bounding probe fan-in and file-handle count.

Counts only ever increase (edges are only added — deletions would need the
signed-delta variant). The differential gate in tests/test_tri_index.py
replays planted and random batches against a full count_triangles recompute
after every batch, before and after compact().

Layout (dedup_index.py discipline):

    state_dir/
      batches/b{N}/edges/   canonical new edges accepted in batch N
      batches/b{N}/tri/     batch N's per-node increments (node, d_tri)
      baseline/g{N}/...     compacted generation covering batches <= N
      _CURRENT, _BASELINE   atomic-rename pointers

update() returns the increment delta (None for a replayed batch id — the
idempotence contract shared by every maintainer here).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TriangleMaintainer:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        src_col: str = "src",
        dst_col: str = "dst",
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.src_col = src_col
        self.dst_col = dst_col
        os.makedirs(os.path.join(state_dir, "batches"), exist_ok=True)
        os.makedirs(os.path.join(state_dir, "baseline"), exist_ok=True)

    # -- pointers (dedup_index.py discipline) ------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, "_CURRENT")

    def _baseline_pointer_path(self) -> str:
        return os.path.join(self.state_dir, "_BASELINE")

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

    def _committed_version(self) -> int | None:
        return self._read_pointer(self._pointer_path())

    def _baseline_version(self) -> int | None:
        return self._read_pointer(self._baseline_pointer_path())

    def _batch_dir(self, batch_id: int, leaf: str) -> str:
        return os.path.join(self.state_dir, "batches", f"b{batch_id:010d}", leaf)

    def _baseline_dir(self, version: int, leaf: str) -> str:
        return os.path.join(self.state_dir, "baseline", f"g{version:010d}", leaf)

    def _committed_dirs(self, leaf: str) -> list[str]:
        committed = self._committed_version()
        if committed is None:
            return []
        baseline = self._baseline_version()
        dirs: list[str] = []
        if baseline is not None:
            dirs.append(self._baseline_dir(baseline, leaf))
        floor = baseline if baseline is not None else -1
        root = os.path.join(self.state_dir, "batches")
        dirs += [
            os.path.join(root, d, leaf)
            for d in sorted(os.listdir(root))
            if d.startswith("b")
            and d[1:].isdigit()
            and floor < int(d[1:]) <= committed
        ]
        return dirs

    # -- state -------------------------------------------------------------
    def edges(self) -> DataFrame | None:
        """The committed canonical (a, b) edge set (union of the chain)."""
        dirs = self._committed_dirs("edges")
        return self.spark.read.parquet(*dirs) if dirs else None

    def counts(self) -> DataFrame | None:
        """The served (node, n_tri) table: sum of the committed increment
        chain (nodes in >= 1 triangle). One aggregate over O(chain) small
        frames — compact() keeps the chain short."""
        dirs = self._committed_dirs("tri")
        if not dirs:
            return None
        return (
            self.spark.read.parquet(*dirs)
            .groupBy("node")
            .agg(F.sum("d_tri").cast("long").alias("n_tri"))
            .where(F.col("n_tri") > 0)
        )

    def _canon(self, batch: DataFrame) -> DataFrame:
        s, d = F.col(self.src_col), F.col(self.dst_col)
        return (
            batch.where(s != d)
            .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
            .distinct()
        )

    def update(self, batch: DataFrame, batch_id: int) -> DataFrame | None:
        """Fold one batch of (possibly directed / duplicated) edges in;
        returns the (node, d_tri) per-node triangle increments this batch
        caused (empty frame if none). Replay of a committed batch id is a
        no-op returning None."""
        committed = self._committed_version()
        if committed is not None and committed >= batch_id:
            return None

        canon = self._canon(batch)
        old_edges = self.edges()
        if old_edges is None:
            new_e = canon.localCheckpoint()
            union_edges = new_e
        else:
            new_e = canon.join(old_edges, ["a", "b"], "left_anti").localCheckpoint()
            union_edges = old_edges.unionByName(new_e)

        # symmetrized adjacency of the union graph: common-neighbor probes
        # must see both directions and same-batch edges.
        adj = union_edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                )
            ).alias("e")
        ).select("e.u", "e.v")

        # per new edge (a, b): common neighbors c — an (a, c) probe then a
        # semi-join on (b, c); each is an equi-join of the delta against the
        # chain (delta broadcast, chain scanned map-side).
        cand = new_e.join(
            adj.withColumnRenamed("u", "a").withColumnRenamed("v", "c"), "a"
        ).where(F.col("c") != F.col("b"))
        tris = cand.join(
            adj.withColumnRenamed("u", "b").withColumnRenamed("v", "c"),
            ["b", "c"],
            "left_semi",
        )
        # canonical sorted triple: a triangle with j new edges arrived j
        # times (once per containing new edge) — distinct restores once.
        canon_tri = tris.select(
            F.array_sort(F.array("a", "b", "c")).alias("t")
        ).distinct()
        delta = (
            canon_tri.select(F.explode("t").alias("node"))
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("d_tri"))
        )

        # O(|delta|) writes only — history is never rewritten.
        new_e.write.mode("overwrite").parquet(self._batch_dir(batch_id, "edges"))
        delta.write.mode("overwrite").parquet(self._batch_dir(batch_id, "tri"))
        self._write_pointer(self._pointer_path(), batch_id)
        return self.spark.read.parquet(self._batch_dir(batch_id, "tri"))

    # -- compaction --------------------------------------------------------
    def compact(self) -> int | None:
        """Fold baseline + committed deltas into one new baseline generation
        (edges unioned, increments summed) and truncate the chain.
        Idempotent under replay (dedup_index.py discipline: consolidated
        dirs keyed by the covered batch id, pointer move is the publish)."""
        committed = self._committed_version()
        if committed is None:
            return None
        if self._baseline_version() == committed:
            return committed
        edge_dirs = self._committed_dirs("edges")
        self.spark.read.parquet(*edge_dirs).write.mode("overwrite").parquet(
            self._baseline_dir(committed, "edges")
        )
        tri_dirs = self._committed_dirs("tri")
        (
            self.spark.read.parquet(*tri_dirs)
            .groupBy("node")
            .agg(F.sum("d_tri").cast("long").alias("d_tri"))
            .write.mode("overwrite")
            .parquet(self._baseline_dir(committed, "tri"))
        )
        self._write_pointer(self._baseline_pointer_path(), committed)
        root = os.path.join(self.state_dir, "batches")
        for d in os.listdir(root):
            if d.startswith("b") and d[1:].isdigit() and int(d[1:]) <= committed:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        base_root = os.path.join(self.state_dir, "baseline")
        for d in os.listdir(base_root):
            if d.startswith("g") and d[1:].isdigit() and int(d[1:]) < committed:
                shutil.rmtree(os.path.join(base_root, d), ignore_errors=True)
        return committed
