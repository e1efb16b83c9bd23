"""Deterministic stratified sampling — per-stratum exact-k selection by
content hash.

A training-data pipeline constantly carves small fixed-size per-source
slices out of a huge corpus: eval sets, human-inspection samples, ablation
subsets. Random sampling is irreproducible across runs and engines;
`TABLESAMPLE` gives no per-stratum size guarantee. Hash-rank sampling gives
both: rank rows within each stratum by md5 of a stable content column and
keep the k smallest — a uniform-looking, content-addressed choice that any
engine reproduces bit-for-bit (md5 is everywhere; no RNG, no seed state).

Scale shape: one window over the stratum partitioning — a single shuffle on
the stratum key; with heavy strata the rank is computed per partition after
hash-partitioning, no global sort. Adding new documents to the corpus
changes the selection only where the new docs hash below an incumbent —
the sample is stable under append, which is what makes it usable as a
frozen eval slice (see also q55's decontamination, which assumes the eval
slice is reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    hash_col: str,
    k: int,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Keep the k rows with the smallest (md5(hash_col), tiebreak id_cols)
    per stratum. Returns the input columns plus `rk` (1-based rank within
    the stratum). Deterministic for any engine that computes md5."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(hash_col).cast("binary")).asc(),
        *[F.col(c).asc() for c in id_cols],
    )
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    hash_col: str,
    weights: DataFrame,
    weight_col: str,
    total_k: int,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Materialize a mixture: per stratum, keep floor(total_k * weight + 0.5)
    rows chosen by the same deterministic md5 rank as `stratified_sample`.

    This is the step that turns mixture WEIGHTS (e.g. the temperature-scaled
    token shares of q57) into an actual sampled corpus with per-source
    counts proportional to the weights — the composition a training run
    executes. `floor(x + 0.5)` rather than round(): both engines floor
    doubles identically, while round-on-double half-case conventions differ
    (HALF_UP vs away-from-zero vs banker's) — the q29-tol lesson applied to
    quotas.

    Scale shape: the weights frame is |strata| rows — broadcast joined onto
    the ranked corpus, so the only shuffle is the stratum-key window that
    stratified-rank sampling already pays. A stratum whose quota exceeds its
    row count yields the whole stratum (floor cap, no error), mirroring how
    a mixture over-asks a small source.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(hash_col).cast("binary")).asc(),
        *[F.col(c).asc() for c in id_cols],
    )
    quotas = weights.select(
        strata_col,
        F.floor(F.lit(total_k) * F.col(weight_col) + F.lit(0.5))
        .cast("long")
        .alias("k_quota"),
    )
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .join(F.broadcast(quotas), strata_col)
        .where(F.col("rk") <= F.col("k_quota"))
    )
