"""Bloom-filter membership: "has this key been seen in history?" without
joining history.

The ingest-dedup shape every crawl/training pipeline needs: a daily delta
must be checked against the accumulated corpus (URLs already fetched,
(user, action) combinations already recorded, content digests already
stored). Joining the delta against the full history key set shuffles
O(|history|) every day; at 100 TB of history that is the dominant cost of
ingest. A Bloom filter built over the history keys is a few hundred KiB
regardless of history size, broadcasts to every executor, and definitively
rejects ("never seen") most of a mostly-novel delta map-side — only the
bloom-POSITIVE keys, i.e. the true duplicates plus an ~(1-e^{-kn/m})^k
false-positive sliver, reach the exact verify join. Bloom filters have no
false negatives by construction, and the verify join removes the false
positives, so the operator's result is EXACT (SQL-oracle-checkable); the
filter only changes how much data moves.

Spark-first design — everything JVM-side, no Python in any per-row path:
- The filter is a DataFrame of (word, bits) int64 rows — position p maps to
  word p div 64, bit p mod 64 — built with explode + partial-aggregated
  BIT_OR (Spark's map-side combine keeps the shuffle at one word-map per
  partition, the combiner the reference lacks — /root/reference/
  mr/worker.go:86-89). At the default 2^20 bits the map is <= 16,384 rows
  (~256 KiB) — broadcastable no matter how large the corpus is.
- Probing is an explode of the k candidate positions + a broadcast-hash
  join against the word map + a per-key ALL(bit set) aggregate; a key whose
  word is absent from the map misses immediately (NULL bits -> not set).
- Hash family: xxhash64(key..., seed + i) mod num_bits for i in 0..k-1 —
  deterministic across runs and engines, so a filter persisted by one job
  (see `streaming/dedup_index.py` for the persistence pattern) is probe-
  compatible with any later delta.

Sizing at 100 TB: num_bits ~ 10 bits per distinct history key gives ~1 %
false positives at num_hashes=7 (standard Bloom calculus, Bloom CACM 1970);
derive n from `approx_count_distinct` over the history key column and round
up to a power of two. The default (2^20 bits, k=5) is sized for the test
fixtures.

Reference provenance: the reference has no membership operator; the closest
capability is the reduce-side distinct in the indexer
(/root/reference/mr-main/mrapps/indexer.go:22-27). This module is part of
the north-star ingest-dedup extension (SURVEY.md §2C last row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.functions.numeric import floor_div

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 5
DEFAULT_SEED = 7


def _positions(key_cols: Sequence[str], num_bits: int, num_hashes: int, seed: int) -> Column:
    """array<long> of the key's num_hashes candidate bit positions."""
    return F.array(
        *[
            F.pmod(F.xxhash64(*key_cols, F.lit(seed + i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def _word_bit(pos: Column) -> tuple[Column, Column]:
    return floor_div(pos, 64).alias("word"), F.pmod(pos, F.lit(64)).cast("int").alias("bit")


def build_bloom(
    keys: DataFrame,
    key_cols: Sequence[str],
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Bloom filter over the keys of `keys` as a (word, bits) frame.

    One pass over the key set: explode the k positions, BIT_OR the bit
    masks per 64-bit word. No distinct needed — OR-ing a duplicate key's
    bits is a no-op, so deduplication would only add a shuffle. Partial
    aggregation bounds the shuffle at (num_bits/64) rows per input
    partition; the result is <= num_bits/64 rows total, independent of
    |keys|."""
    pos = keys.select(
        F.explode(_positions(key_cols, num_bits, num_hashes, seed)).alias("pos")
    )
    word, bit = _word_bit(F.col("pos"))
    return (
        pos.select(word, bit)
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
    )


def bloom_maybe_seen(
    delta_keys: DataFrame,
    bloom: DataFrame,
    key_cols: Sequence[str],
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """delta_keys + boolean `bloom_maybe`: True iff all k bits are set.

    False is definitive (Bloom filters have no false negatives); True means
    "verify exactly". The word map joins broadcast — it is bounded by
    num_bits/64 rows by construction — so the probe never shuffles the
    delta."""
    probe = delta_keys.select(
        *key_cols, F.explode(_positions(key_cols, num_bits, num_hashes, seed)).alias("pos")
    )
    word, bit = _word_bit(F.col("pos"))
    probe = probe.select(*key_cols, word, bit)
    hit = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")) != 0
    )
    return (
        probe.join(F.broadcast(bloom), "word", "left")
        .select(*key_cols, hit.cast("int").alias("hit"))
        .groupBy(*key_cols)
        .agg((F.min("hit") == 1).alias("bloom_maybe"))
    )


def seen_membership(
    delta: DataFrame,
    history: DataFrame,
    key_cols: Sequence[str],
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Tag every `delta` row with boolean `seen`: does its key appear in
    `history`? Exact result; the Bloom filter only routes the work.

    Dataflow (three sub-plans, one output):
      1. history keys -> distinct -> Bloom word map (tiny, broadcast).
      2. delta's distinct keys probe the map. Bloom-NEGATIVE keys are
         definitively new — they never touch history again.
      3. Only bloom-positive keys left-join the distinct history key set
         (duplicates + FP sliver), resolving exact membership.
    The per-row answer joins back to `delta` on the key columns.

    At 100 TB: step 3's left side is |true dups| + |false positives| keys,
    not |delta|; step 2 is map-side; step 1 is one scan of the history KEY
    column (or a maintained filter — rebuild is associative, so a streaming
    maintainer can BIT_OR per-batch filters)."""
    key_cols = list(key_cols)
    raw_hist = history.select(*key_cols)
    bloom = build_bloom(raw_hist, key_cols, num_bits=num_bits, num_hashes=num_hashes, seed=seed)
    delta_keys = delta.select(*key_cols).distinct()
    maybe = bloom_maybe_seen(
        delta_keys, bloom, key_cols, num_bits=num_bits, num_hashes=num_hashes, seed=seed
    )
    negatives = maybe.where(~F.col("bloom_maybe")).select(
        *key_cols, F.lit(False).alias("seen")
    )
    pos_keys = maybe.where(F.col("bloom_maybe")).select(*key_cols)
    # Verify WITHOUT shuffling (or deduplicating) history: semi-join history
    # against the bloom-positive key set — the small side, which AQE
    # broadcasts — so history is only scanned map-side; then distinct the
    # matches (bounded by |pos_keys|) and flag. A left join against raw
    # history would duplicate a key stored more than once.
    matched = raw_hist.join(pos_keys, key_cols, "left_semi").distinct()
    positives = pos_keys.join(
        matched.withColumn("_in_hist", F.lit(True)), key_cols, "left"
    ).select(*key_cols, F.coalesce("_in_hist", F.lit(False)).alias("seen"))
    flags = negatives.unionByName(positives)
    out = delta.join(flags, key_cols, "left")
    # NULL keys never equi-join (neither here nor in a plain membership
    # join), so they'd surface as seen=NULL; resolve them to the membership
    # answer a LEFT JOIN gives: not seen.
    return out.withColumn("seen", F.coalesce("seen", F.lit(False)))
