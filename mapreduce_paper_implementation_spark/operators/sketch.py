"""Sketch/approximate aggregations beyond HLL (q34): bounded-memory
heavy hitters and mergeable count-min sketches.

Why they exist: at 100 TB the exact top-k over an exploding key space
(q08's orderBy+limit after a full groupBy) is fine when the distinct-key
set fits a shuffle; when it doesn't (URLs, n-grams at web scale), the scale
path is per-partition bounded state + a merge — the same partial/final
decomposition as every combiner, but with capped partial size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Eviction headroom: the per-partition accumulator may grow to this multiple
# of `per_partition` before being pruned back down. Headroom >1 matters for
# accuracy — evicting to exactly the cap after every batch would let a key
# that arrives steadily-but-thinly be re-evicted each round before its count
# accumulates; 4x keeps recent low-count keys alive across a few batches.
_EVICT_FACTOR = 4


def _merge_counts(acc: dict, counts, cap: int, evicted_bound: int = 0) -> int:
    """Fold one batch's (key -> n) counts into the accumulator, then prune to
    the top `cap` keys whenever the accumulator exceeds _EVICT_FACTOR * cap.
    Memory is O(_EVICT_FACTOR * cap + batch distinct keys) — bounded however
    many distinct keys the partition holds.

    Space-saving-style admission baseline: `evicted_bound` is the largest
    count any pruned key had when it was dropped; a key NOT currently
    resident is admitted at `batch_count + evicted_bound` (the most it could
    have accumulated before being evicted). Without this, a heavy key whose
    arrivals are thin-but-steady could be re-evicted each round and restart
    from zero forever; with it, any key with global partition frequency above
    the running eviction bound is guaranteed to end resident. Counts are
    therefore OVER-estimates by at most `evicted_bound` for keys readmitted
    after an eviction, and exact for keys that stay resident throughout
    (eviction never touches a top-`cap` key, so true heavy hitters keep
    exact counts). Returns the updated bound — callers thread it through
    successive batches."""
    for key, n in counts.items():
        if key in acc:
            acc[key] += int(n)
        else:
            acc[key] = int(n) + evicted_bound
    if len(acc) > _EVICT_FACTOR * cap:
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        evicted_bound = max(evicted_bound, ranked[cap][1])
        acc.clear()
        acc.update(ranked[:cap])
    return evicted_bound


def approx_top_k(
    df: DataFrame, key_col: str, k: int = 10, per_partition: int = 1000
) -> DataFrame:
    """Space-saving-style approximate top-k: each partition keeps only its
    local top `per_partition` keys (memory bounded during accumulation by
    _merge_counts's eviction, regardless of key cardinality), partials are
    summed and the global top-k taken.

    Counts are exact for keys that stay resident in their partition's
    accumulator (true heavy hitters — eviction only prunes below the local
    top-cap), UNDER-estimated for keys dropped at yield-time truncation, and
    OVER-estimated by at most the partition's eviction bound for keys
    readmitted after an eviction (space-saving admission, _merge_counts).
    Any key with global frequency > n_rows / per_partition is guaranteed to
    survive in at least one partition. Choose per_partition >> k (default
    100x) so the returned set and order match the exact top-k on Zipf-shaped
    data — asserted against the exact computation in pytest.

    Returns (key_col, cnt) ordered by cnt desc, key asc, limited to k.
    """
    import pandas as pd

    def local_top(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[object, int] = {}
        bound = 0
        for pdf in it:
            bound = _merge_counts(acc, pdf[key_col].value_counts(), per_partition, bound)
        if acc:
            top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:per_partition]
            yield pd.DataFrame({key_col: [t[0] for t in top], "cnt": [t[1] for t in top]})

    schema = f"{key_col} string, cnt long"
    local = df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        local_top, schema=schema
    )
    return (
        local.groupBy(key_col)
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), key_col)
        .limit(k)
    )


def count_min_sketch(df: DataFrame, key_col: str, eps: float = 0.001, conf: float = 0.99, seed: int = 42):
    """One mergeable count-min sketch over a column (Spark's built-in
    aggregate; binary, driver-decodable via
    spark.util.sketch.CountMinSketch.readFrom). Partial sketches merge
    associatively — the incremental-rollup property (operators/incremental)
    for frequency state."""
    return df.agg(
        F.count_min_sketch(F.col(key_col), F.lit(eps), F.lit(conf), F.lit(seed)).alias("cms")
    )
