"""Incremental connected components: the materialized streaming twin of
operators/graph.py:connected_components (q41's dedup-cluster labeling).

A near-dup pipeline discovers pair edges batch by batch (e.g. from
streaming/dedup_index.py); rebuilding the component labeling from ALL
historical pairs each day is O(corpus). This maintainer keeps the
(id, component) table materialized and folds each edge batch in at
O(|delta| + |affected components|):

1. Map the batch's edge endpoints to their CURRENT labels (an unseen
   vertex labels itself). Edges inside one component map to a self-loop
   and drop out.
2. Run connected_components on the resulting COMPONENT graph — contracted,
   so its size is O(|batch|) regardless of corpus size.
3. Apply the resulting old-label -> new-label mapping to the label table
   (mapping is O(|batch|) rows -> broadcast join, a map-only pass), and
   append the batch's new vertices.

Correctness rests on the standard contraction argument: component labels
are min-reachable-vertex ids, so merging components by min over the
contracted graph yields exactly the min-label CC of the edge union —
historical EDGES never need to be stored, only the label table. Labels
only ever decrease (new edges can only lower a min), the monotonicity the
r06 verdict names; the differential gate in tests/test_cc_index.py replays
planted and random batches against a full recompute after every batch.

State is versioned like streaming/rollup.py (labels are a full small
table per version; at 100 TB you'd store them bucketed by id and rewrite
only the buckets whose rows changed — same pointer discipline):

    state_dir/
      v{N}/labels/     (id, component) after batch N
      v{N}/changed/    the batch's output delta: rows added OR relabeled
      _CURRENT         highest committed batch id (atomic rename)

update() returns the changed-rows delta (None for a replayed batch id —
the idempotence contract shared by every maintainer here). vacuum()
bounds disk by dropping superseded versions.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.graph import (
    connected_components,
)


class ComponentsMaintainer:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        src_col: str = "id_a",
        dst_col: str = "id_b",
        max_iter: int = 20,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.src_col = src_col
        self.dst_col = dst_col
        # propagation-round cap for the internal CC calls; the contracted
        # component graph is O(|batch|) so the default suits dedup clusters,
        # but a first batch over a long-chain graph may need more.
        self.max_iter = max_iter
        os.makedirs(state_dir, exist_ok=True)

    # -- pointer (rollup.py discipline) ------------------------------------
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
        os.replace(tmp, self._pointer_path())

    def _dir(self, version: int, leaf: str) -> str:
        return os.path.join(self.state_dir, f"v{version:010d}", leaf)

    # -- state -------------------------------------------------------------
    def labels(self) -> DataFrame | None:
        """The committed (id, component) table."""
        v = self._committed_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._dir(v, "labels"))

    def changed(self, batch_id: int) -> DataFrame:
        """The output delta a committed batch emitted (for re-reading)."""
        return self.spark.read.parquet(self._dir(batch_id, "changed"))

    def update(self, pairs: DataFrame, batch_id: int) -> DataFrame | None:
        """Fold one batch of pair edges in; returns the (id, component)
        rows that are new or relabeled. Replay of a committed batch id is
        a no-op returning None."""
        committed = self._committed_version()
        if committed is not None and committed >= batch_id:
            return None
        prior = self.labels()

        if prior is None:
            labels = connected_components(pairs, self.src_col, self.dst_col, max_iter=self.max_iter)
            labels.write.mode("overwrite").parquet(self._dir(batch_id, "labels"))
            labels = self.spark.read.parquet(self._dir(batch_id, "labels"))
            labels.write.mode("overwrite").parquet(self._dir(batch_id, "changed"))
            self._commit_version(batch_id)
            return self.spark.read.parquet(self._dir(batch_id, "changed"))

        edges = pairs.select(
            F.col(self.src_col).alias("u"), F.col(self.dst_col).alias("v")
        )
        verts = (
            edges.select(F.col("u").alias("id"))
            .unionByName(edges.select(F.col("v").alias("id")))
            .distinct()
        )
        # current label per batch endpoint (unseen vertex labels itself) —
        # prior is read keyed by id; at scale this join co-locates against
        # the bucketed label store.
        vlab = verts.join(prior, "id", "left").select(
            "id", F.coalesce("component", "id").alias("lbl")
        )
        # contracted component graph: O(|batch|) edges, self-loops dropped.
        comp_edges = (
            edges.join(vlab.withColumnRenamed("id", "u"), "u")
            .withColumnRenamed("lbl", "la")
            .join(
                vlab.withColumnRenamed("id", "v").withColumnRenamed("lbl", "lb"),
                "v",
            )
            .select("la", "lb")
            .where(F.col("la") != F.col("lb"))
            .distinct()
        )
        # old-label -> merged-label mapping (only labels that actually
        # change); min-over-contraction == min-over-union, so applying it
        # reproduces the full recompute exactly.
        mapping = (
            connected_components(comp_edges, "la", "lb", max_iter=self.max_iter)
            .where(F.col("id") != F.col("component"))
            .select(F.col("id").alias("old_lbl"), F.col("component").alias("new_lbl"))
            if not comp_edges.isEmpty()
            else None
        )

        new_verts = vlab.join(prior, "id", "left_anti").select(
            "id", F.col("lbl").alias("component")
        )
        all_labels = prior.unionByName(new_verts)
        if mapping is not None:
            # O(|batch|)-row mapping: broadcast, map-only relabel pass.
            all_labels = all_labels.join(
                F.broadcast(mapping),
                all_labels["component"] == mapping["old_lbl"],
                "left",
            ).select(
                "id", F.coalesce("new_lbl", "component").alias("component")
            )

        all_labels.write.mode("overwrite").parquet(self._dir(batch_id, "labels"))
        committed_labels = self.spark.read.parquet(self._dir(batch_id, "labels"))
        # output delta: new vertices + every vertex whose label moved.
        delta = committed_labels.join(
            prior.withColumnRenamed("component", "old_component"), "id", "left"
        ).where(
            F.col("old_component").isNull()
            | (F.col("old_component") != F.col("component"))
        ).select("id", "component")
        delta.write.mode("overwrite").parquet(self._dir(batch_id, "changed"))
        self._commit_version(batch_id)
        return self.spark.read.parquet(self._dir(batch_id, "changed"))

    def vacuum(self, keep: int = 1) -> list[int]:
        """Drop superseded versions, keeping the committed one plus the
        newest `keep` below it. Returns the removed version ids."""
        committed = self._committed_version()
        if committed is None:
            return []
        versions = sorted(
            int(d[1:])
            for d in os.listdir(self.state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )
        superseded = [v for v in versions if v < committed][: -keep if keep else None]
        for v in superseded:
            shutil.rmtree(
                os.path.join(self.state_dir, f"v{v:010d}"), ignore_errors=True
            )
        return superseded


def cluster_split_view(labels: "DataFrame | None", docs: "DataFrame") -> "DataFrame":
    """q124's leakage-safe per-doc split assignment served from MAINTAINED
    component labels: pass ComponentsMaintainer.labels() (or None before
    the first batch) and the current document corpus; the tail is the SAME
    operators/serving.py:cluster_split_assign the batch query runs, so
    served assignments equal the batch recompute bit-exactly whenever the
    label tables agree — which the per-batch differential in
    tests/test_cc_index.py pins for the maintainer.

    Serving caveat (by design, not a bug): component labels only ever
    DECREASE as edge batches arrive, so a doc's cluster id — and with it
    its split — can CHANGE when two components merge. A production
    pipeline therefore pins the split at a release cut (materializes this
    view once per release) rather than streaming per-doc splits; the view
    exists so the release cut is an O(labels) readout, never a corpus
    re-cluster."""
    from mapreduce_paper_implementation_spark.operators.serving import (
        cluster_split_assign,
    )

    return cluster_split_assign(docs, labels)
