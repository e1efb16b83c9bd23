"""Distributed k-means (Lloyd's algorithm) in DataFrames — the offline
build step for the IVF similarity index (operators/similarity.py:ivf_topk
uses deterministic first-k centroids as a stand-in; this trains real ones).

Per iteration:
  assign:  centroids ride along as ONE broadcast array-of-structs row; the
           nearest cell by squared L2 is a NARROW per-vector map
           (array_sort over k structs — k is small), never a k-way
           explode + window shuffle of the vectors
  update:  element-wise mean per cluster via posexplode ->
           groupBy(cell, pos).avg -> re-assemble ordered arrays
           (whole-stage codegen; no Python, no HOF accumulation)
  converge: total squared centroid shift (computed driver-side over the
           k collected means) < tol

Scale notes (round-14 optimization, guide §2.4/§5): the data crosses ONE
shuffle per iteration — the (cell, pos) partial/final average (the
combiner pattern). Centroids are a k-row driver-held list between
iterations (the Spark-MLlib design: k x dim doubles, broadcast into the
assignment expression each round), so one Lloyd round is ONE Spark job —
the previous formulation paid a k-way candidate explode + a window
shuffle of every vector per assignment, plus a localCheckpoint job and a
separate shift-collect job per round (3 jobs and 2 vector shuffles per
round -> 1 job, 0 vector shuffles). localCheckpoint on the input keeps
iterations re-reading a materialized frame like before. Classic MapReduce
workload shape (map = assign, reduce = re-center), expressed
declaratively.

Exactness contract (unchanged): assignment ranks ROUND(d2, 6) with ties
to the lower cell id; means are the identical posexplode/avg aggregation;
doubles cross the py4j boundary losslessly (IEEE-754 both sides), so the
returned centroids are bit-identical to the previous formulation (pinned
by the q29/q118 oracles and tests/test_properties.py's pure-Python Lloyd
replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, StructField, StructType

from mapreduce_paper_implementation_spark.functions.vectors import to_double_vec

CENTROID_SCHEMA = StructType(
    [
        StructField("cell", IntegerType(), False),
        StructField("c_vec", ArrayType(DoubleType()), True),
    ]
)


def _sq_dist(a, b):
    # squared L2 as a fold — same HOF-for-wide-vectors rationale as
    # functions/vectors.py:dot (SURVEY.md §8.1/§8.14)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_cell(vec_col, cents_arr):
    """Nearest-centroid cell over a bound array<struct<cell,c_vec>> column:
    ROUND(d2, 6) ascending, ties to the lower cell id — the exact total
    order the old explode+row_number formulation ranked by (struct sort is
    lexicographic on (d2, cell)). A narrow expression: no explode, no
    window, no shuffle."""
    return F.array_sort(
        F.transform(
            cents_arr,
            lambda c: F.struct(
                F.round(_sq_dist(vec_col, c["c_vec"]), 6).alias("d2"),
                c["cell"].alias("cell"),
            ),
        )
    )[0]["cell"]


def _mean_rows(assigned: DataFrame) -> list:
    """One Spark job: element-wise mean per cell — posexplode ->
    (cell, pos) partial/final average -> ordered re-assembly, collected as
    the <= k bounded centroid rows (never data)."""
    return (
        assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("n_vec")
        )
        .collect()
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
    shift drops below `tol` or after max_iter rounds. (Every engine call
    site uses max_iter=2, tol=0.0 — the exact unrollable build the
    oracles replay — so the shift check is a generic guard, not a tested
    early-exit path.)
    """
    from mapreduce_paper_implementation_spark.operators.parallel import (
        spread_partitions,
    )

    spark = emb.sparkSession
    v = emb.select(F.col(id_col).alias("id"), to_double_vec(vec_col).alias("vec"))
    # spread: the per-iteration argmin+re-center job inherits THIS frame's
    # partitioning; a one-row-group scan would pin it to one core
    v = spread_partitions(v).localCheckpoint()  # read source once; iterations rescan this

    init = v.orderBy("id").limit(k).select("id", "vec").collect()
    if len(init) < k:
        raise ValueError(
            f"kmeans_fit: k={k} but only {len(init)} vectors available to seed"
        )
    init.sort(key=lambda r: r["id"])
    # driver-held centroid list: [(cell 1..k, [dim doubles])] — bounded at
    # k rows, the same k-row table the old code kept as a checkpointed frame
    cents: list[tuple[int, list[float]]] = [
        (i + 1, list(r["vec"])) for i, r in enumerate(init)
    ]

    for _ in range(max_iter):
        # centroids ride as ONE broadcast array row (a local-relation agg —
        # k literal structs inline would bloat the expression tree and
        # re-pay codegen per iteration; measured slower)
        carr = spark.createDataFrame(cents, CENTROID_SCHEMA).agg(
            F.collect_list(F.struct("cell", "c_vec")).alias("_cents")
        )
        assigned = v.crossJoin(F.broadcast(carr)).select(
            _nearest_cell(F.col("vec"), F.col("_cents")).alias("cell"), "vec"
        )
        means = {r["cell"]: list(r["n_vec"]) for r in _mean_rows(assigned)}
        # A cell that lost every member produces no mean row; carry the old
        # vector forward — the cell keeps existing and can re-acquire
        # members in a later round; its shift contribution is exactly 0.
        new_cents = [(c, means.get(c, cv)) for c, cv in cents]
        shift = sum(
            sum((a - b) * (a - b) for a, b in zip(cv, nv))
            for (_, cv), (_, nv) in zip(cents, new_cents)
        )
        cents = new_cents
        if shift < tol:
            break
    assert len(cents) == k, "kmeans_fit invariant: one centroid per cell"
    return spark.createDataFrame(cents, CENTROID_SCHEMA)


def _assign(v: DataFrame, cents: DataFrame) -> DataFrame:
    # Rank on ROUND(d2, 6), not raw doubles: the q29 oracle replays these
    # iterations in DuckDB, and raw-double ordering can flip on cross-engine
    # ulp differences (different summation forms/orders). Same contract as
    # similarity.py's ROUND(cos, 6) ranks; sub-1e-6 ties break to the lower
    # cell id deterministically in both engines.
    #
    # Round-14 shape: the centroid frame collapses to ONE array-of-structs
    # row (collect_list agg) broadcast onto the vectors, and the argmin is
    # a narrow array_sort — the old crossJoin(k) + row_number window
    # shuffled every vector k times per call (guide §2.4).
    carr = cents.agg(F.collect_list(F.struct("cell", "c_vec")).alias("_cents"))
    return (
        v.crossJoin(F.broadcast(carr))
        .select("id", "vec", _nearest_cell(F.col("vec"), F.col("_cents")).alias("cell"))
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
