"""Similarity search over embedding columns: exact brute-force top-k plus
two approximate scale paths (random-hyperplane LSH, IVF coarse quantization).

Scale posture (100 TB / billions of vectors):
- Brute force is the baseline: broadcast the (small) probe set, one pass
  over candidates, per-probe top-k via window — cost O(n_probes * n).
- LSH: bucket vectors by sign-pattern on H fixed hyperplanes; probes only
  scan buckets within `multiprobe` hamming distance — cost O(n / 2^H *
  #probed_buckets) per probe, tunable recall.
- IVF: coarse-assign every vector to its nearest of k centroids (one
  broadcast join), probes scan the `nprobe` nearest cells. Centroids here
  are deterministic (first-k vectors) — a stand-in for k-means which is an
  offline build step in a real deployment.
- All dot products are JVM higher-order functions; hyperplanes/centroids are
  broadcast literals/DataFrames. No Python per-row.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.functions.vectors import cosine, dot, norm, to_double_vec


def _prep(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("id"), to_double_vec(vec_col).alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))


def brute_force_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast probes, scan candidates once.
    Returns (probe_id, neighbor_id, cos_sim DECIMAL(9,6), rnk)."""
    cand = _prep(emb, id_col, vec_col)
    p = _prep(probes, id_col, vec_col).select(
        F.col("id").alias("probe_id"), F.col("vec").alias("p_vec"), F.col("nrm").alias("p_nrm")
    )
    pairs = cand.join(F.broadcast(p), F.col("id") != F.col("probe_id")).select(
        "probe_id",
        F.col("id").alias("neighbor_id"),
        F.round(cosine(F.col("p_vec"), F.col("vec"), F.col("p_nrm"), F.col("nrm")), 6)
        .cast("decimal(9,6)")
        .alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    # Rank on the exact decimal; project DOUBLE (output dtype contract).
    return (
        pairs.select(
            "probe_id",
            "neighbor_id",
            F.col("cos_sim").cast("double").alias("cos_sim"),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= k)
        .orderBy("probe_id", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Bucket id = sign bits of the vector against each hyperplane."""
    bits = [
        F.when(
            dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p])) > 0, F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        for p in planes
    ]
    out = F.lit(0).cast("long")
    for j, b in enumerate(bits):
        out = out + F.shiftleft(b, j)
    return out


def lsh_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    multiprobe_hamming: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to LSH buckets within
    `multiprobe_hamming` of the probe's bucket. Returns the same schema as
    brute_force_topk; recall is tested against it.

    Parameter note: random-hyperplane LSH trades recall for scan fraction by
    collision probability (1 - angle/pi)^planes. On weakly-clustered data
    (fixture neighbors are ~60 deg apart) wide multiprobe is required —
    defaults (8 planes, hamming<=4) scan ~36% of buckets for ~0.87 recall.
    Strongly clustered corpora (true near-dups) support many more planes and
    tiny multiprobe; tune per dataset.

    `dim` is required: it's a static property of the embedding model, and a
    dataframe sniff would cost a driver round-trip + an extra Spark job per
    plan build (the removed `.first()` fallback did exactly that)."""
    if dim is None:
        raise TypeError(
            "lsh_topk requires dim= (the embedding dimension — a static "
            "property of the embedding model; sniffing it from the data "
            "would be a driver-side job per call)"
        )
    planes = _hyperplanes(dim, n_planes, seed)

    cand = _prep(emb, id_col, vec_col).withColumn("bucket", lsh_bucket_expr("vec", planes))
    p = (
        _prep(probes, id_col, vec_col)
        .withColumn("bucket", lsh_bucket_expr("vec", planes))
        .select(
            F.col("id").alias("probe_id"),
            F.col("vec").alias("p_vec"),
            F.col("nrm").alias("p_nrm"),
            F.col("bucket").alias("p_bucket"),
        )
    )
    pairs = cand.join(
        F.broadcast(p),
        (F.col("id") != F.col("probe_id"))
        & (
            F.bit_count(F.col("bucket").bitwiseXOR(F.col("p_bucket")))
            <= multiprobe_hamming
        ),
    ).select(
        "probe_id",
        F.col("id").alias("neighbor_id"),
        F.round(cosine(F.col("p_vec"), F.col("vec"), F.col("p_nrm"), F.col("nrm")), 6)
        .cast("decimal(9,6)")
        .alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    # Rank on the exact decimal; project DOUBLE (output dtype contract).
    return (
        pairs.select(
            "probe_id",
            "neighbor_id",
            F.col("cos_sim").cast("double").alias("cos_sim"),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= k)
        .orderBy("probe_id", "rnk")
    )


def ivf_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k. Coarse centroids come from `centroids`
    ((cell, c_vec array<double>) — e.g. operators/kmeans.py:kmeans_fit, the
    offline index-build step) or default to the deterministic n_cells
    lowest-id vectors: assign every vector to its nearest centroid by
    cosine, probes scan their `nprobe` nearest cells."""
    v = _prep(emb, id_col, vec_col)
    if centroids is not None:
        cents = centroids.select(
            "cell", F.col("c_vec"), norm(F.col("c_vec")).alias("c_nrm")
        )
    else:
        cents = (
            v.orderBy("id")
            .limit(n_cells)
            .select(F.col("id").alias("cell"), F.col("vec").alias("c_vec"), F.col("nrm").alias("c_nrm"))
        )

    def assign(df: DataFrame, n_keep: int, id_alias: str) -> DataFrame:
        # Cell assignment ranks by ROUND(cos, 6): raw-double ordering could
        # flip on cross-engine ulp differences; rounded scores tie-break by
        # cell id deterministically (same contract as the output ranks).
        scored = df.crossJoin(F.broadcast(cents)).select(
            F.col("id").alias(id_alias),
            "cell",
            F.round(
                cosine(F.col("vec"), F.col("c_vec"), F.col("nrm"), F.col("c_nrm")), 6
            ).alias("c_cos"),
        )
        w = Window.partitionBy(id_alias).orderBy(F.desc("c_cos"), F.asc("cell"))
        return scored.withColumn("cell_rank", F.row_number().over(w)).where(
            F.col("cell_rank") <= n_keep
        ).select(id_alias, "cell")

    cand_cells = assign(v, 1, "id")
    cand = v.join(cand_cells, "id")
    p = _prep(probes, id_col, vec_col)
    probe_cells = assign(p, nprobe, "probe_id").withColumnRenamed("cell", "p_cell")
    pv = p.select(
        F.col("id").alias("probe_id"), F.col("vec").alias("p_vec"), F.col("nrm").alias("p_nrm")
    ).join(probe_cells, "probe_id")

    pairs = cand.join(
        F.broadcast(pv), (F.col("cell") == F.col("p_cell")) & (F.col("id") != F.col("probe_id"))
    ).select(
        "probe_id",
        F.col("id").alias("neighbor_id"),
        F.round(cosine(F.col("p_vec"), F.col("vec"), F.col("p_nrm"), F.col("nrm")), 6)
        .cast("decimal(9,6)")
        .alias("cos_sim"),
    ).distinct()
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    # Rank on the exact decimal; project DOUBLE (output dtype contract).
    return (
        pairs.select(
            "probe_id",
            "neighbor_id",
            F.col("cos_sim").cast("double").alias("cos_sim"),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= k)
        .orderBy("probe_id", "rnk")
    )
