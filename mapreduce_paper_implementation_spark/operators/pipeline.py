"""End-to-end training-data preparation pipeline: the composition every
LLM-corpus build runs, expressed as one lazy DataFrame chain so Catalyst
optimizes ACROSS stages (filters merge, projections prune into the scan —
no materialization between steps unless asked for).

    documents
      -> exact dedup        (keep min doc_id per md5(text))
      -> near-dup removal   (optional: MinHash pair graph -> connected
                             components -> keep component representative)
      -> language filter    (stopword-ratio heuristic)
      -> quality filter     (composite score threshold)
      -> tokenize + stats   (the columns a tokenizer shard job consumes)

Every stage reuses an already-oracled operator (q14/q18/q23/q24/q25), so the
pipeline's own oracle (q43) is pure SQL except the optional near-dup stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.functions.text import token_count
from mapreduce_paper_implementation_spark.operators.dedup import minhash_lsh_pairs
from mapreduce_paper_implementation_spark.operators.graph import connected_components
from mapreduce_paper_implementation_spark.operators.text_analysis import (
    predict_lang,
    quality_score,
)


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    lang: str = "en",
    near_dedup: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns the cleaned corpus (doc_id, source, lang, quality, n_tokens).

    Exact dedup keeps the minimum doc_id per identical text (a window-free
    self-join on the md5 digest: winners = groupBy(digest).min(id), then a
    semi join — both sides shuffle 16-byte digests only). Quality and
    language are computed once in the surviving projection."""
    digests = docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col).cast("binary")).alias("d")
    )
    winners = digests.groupBy("d").agg(F.min("id").alias("keep_id"))
    survivors = docs.join(
        winners.select(F.col("keep_id").alias(id_col)), id_col, "semi"
    )

    if near_dedup:
        pairs = minhash_lsh_pairs(survivors, id_col=id_col, text_col=text_col)
        cc = connected_components(pairs)
        losers = cc.where(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        survivors = survivors.join(losers, id_col, "anti")

    scored = survivors.select(
        id_col,
        "source",
        predict_lang(text_col).alias("lang"),
        F.round(quality_score(text_col, "n_chars"), 6).cast("decimal(9,6)").alias("quality"),
        token_count(text_col).alias("n_tokens"),
    )
    # Output dtype contract: the threshold compare runs on the exact decimal,
    # the projected column is DOUBLE (matches the oracle's CAST AS DOUBLE).
    return (
        scored.where((F.col("lang") == lang) & (F.col("quality") >= min_quality))
        .withColumn("quality", F.col("quality").cast("double"))
        .orderBy(id_col)
    )
