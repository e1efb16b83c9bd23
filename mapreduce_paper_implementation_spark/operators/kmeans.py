"""Distributed k-means (Lloyd's algorithm) in DataFrames — the offline
build step for the IVF similarity index (operators/similarity.py:ivf_topk
uses deterministic first-k centroids as a stand-in; this trains real ones).

Per iteration:
  assign:  broadcast the k centroids, nearest by squared L2 per vector
           (window over k candidate rows per vector — k is small)
  update:  element-wise mean per cluster via posexplode ->
           groupBy(cell, pos).avg -> re-assemble ordered arrays
           (whole-stage codegen; no Python, no HOF accumulation)
  converge: total squared centroid shift (one scalar aggregate) < tol

Scale notes: the data crosses one shuffle per iteration (the (cell, pos)
partial/final average — the combiner pattern again); centroids are always
a k-row broadcast. localCheckpoint truncates lineage per round like
operators/graph.py — without it the plan doubles each iteration. Classic
MapReduce workload shape (map = assign, reduce = re-center), expressed
declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.functions.vectors import to_double_vec


def _sq_dist(a, b):
    # squared L2 as a fold — same HOF-for-wide-vectors rationale as
    # functions/vectors.py:dot (SURVEY.md §8.1/§8.14)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train k centroids; returns (cell int, c_vec array<double>).

    Deterministic: init = vectors of the k lowest ids, ties in assignment
    break toward the lower cell id. Stops when the summed squared centroid
    shift drops below `tol` or after max_iter rounds.
    """
    v = emb.select(F.col(id_col).alias("id"), to_double_vec(vec_col).alias("vec"))
    v = v.localCheckpoint()  # read source once; iterations rescan this

    cents = (
        v.orderBy("id")
        .limit(k)
        .select(F.row_number().over(Window.orderBy("id")).alias("cell"), F.col("vec").alias("c_vec"))
        .localCheckpoint()
    )
    n_init = cents.count()
    if n_init < k:
        raise ValueError(
            f"kmeans_fit: k={k} but only {n_init} vectors available to seed"
        )

    for _ in range(max_iter):
        assigned = _assign(v, cents)
        # element-wise mean per cluster: posexplode -> (cell, pos) partial
        # averages -> ordered re-assembly
        means = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("n_vec")
            )
        )
        # A cell that lost every member produces no mean row; a plain inner
        # join would silently drop it and return < k centroids (shrinking the
        # index ivf_topk probes). Left-join from the OLD centroids and carry
        # the old vector forward — the cell keeps existing and can re-acquire
        # members in a later round; its shift contribution is exactly 0.
        joined = (
            cents.join(means, "cell", "left")
            .select("cell", "c_vec", F.coalesce("n_vec", "c_vec").alias("n_vec"))
            .localCheckpoint()  # materialize once; shift + next cents both read it
        )
        shift = (
            joined.select(_sq_dist(F.col("c_vec"), F.col("n_vec")).alias("d"))
            .agg(F.sum("d").alias("s"))
            .collect()[0]["s"]
        )
        cents = joined.select("cell", F.col("n_vec").alias("c_vec"))
        if shift is not None and shift < tol:
            break
    assert cents.count() == k, "kmeans_fit invariant: one centroid per cell"
    return cents


def _assign(v: DataFrame, cents: DataFrame) -> DataFrame:
    # Rank on ROUND(d2, 6), not raw doubles: the q29 oracle replays these
    # iterations in DuckDB, and raw-double ordering can flip on cross-engine
    # ulp differences (different summation forms/orders). Same contract as
    # similarity.py's ROUND(cos, 6) ranks; sub-1e-6 ties break to the lower
    # cell id deterministically in both engines.
    scored = v.crossJoin(F.broadcast(cents)).select(
        "id", "vec", "cell", F.round(_sq_dist(F.col("vec"), F.col("c_vec")), 6).alias("d2")
    )
    w = Window.partitionBy("id").orderBy(F.asc("d2"), F.asc("cell"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("id", "vec", "cell")
    )


def kmeans_assign(emb: DataFrame, cents: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, cell) for every vector — the IVF cell table a query-time probe
    uses. One broadcast join, no shuffle of the vectors."""
    v = emb.select(F.col(id_col).alias("id"), to_double_vec(vec_col).alias("vec"))
    return _assign(v, cents).select("id", "cell")


def inertia(emb: DataFrame, cents: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> float:
    """Sum of squared distances to the assigned centroid (the k-means
    objective) — one scalar for convergence/quality assertions."""
    v = emb.select(F.col(id_col).alias("id"), to_double_vec(vec_col).alias("vec"))
    scored = _assign(v, cents)
    val = (
        scored.join(cents, "cell")
        .select(_sq_dist(F.col("vec"), F.col("c_vec")).alias("d2"))
        .agg(F.sum("d2").alias("s"))
        .collect()[0]["s"]
    )
    return float(val)
