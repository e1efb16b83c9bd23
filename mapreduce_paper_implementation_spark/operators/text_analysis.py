"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions (JVM-side, codegen'd);
each has an exactly-matching SQL formulation so DuckDB can oracle them.

Determinism rules: ratios computed in IEEE double (identical both engines),
rounded with ROUND(x, 6) and cast DECIMAL, integer arithmetic mod 2^31-1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.functions.text import (
    STOPWORDS,
    lower_tokens,
    token_count,
    tokens,
)

MERSENNE31 = 2_147_483_647

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space —
# the standard GPT-2-style coarse split, minus unicode classes for
# cross-engine determinism.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def stopword_ratio(text_col: Column | str) -> Column:
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(lower_tokens(text_col), lambda t: F.array_contains(sw, t)))
    n_tok = token_count(text_col)
    return F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))


def predict_lang(text_col: Column | str, threshold: float = 0.1) -> Column:
    """Heuristic language ID: English-stopword token ratio >= threshold ->
    'en', else 'unknown'. (A real system uses char-n-gram profiles per
    language; the engine-relevant part — a pure-expression classifier over
    tokens — is identical.)"""
    return F.when(stopword_ratio(text_col) >= threshold, F.lit("en")).otherwise(F.lit("unknown"))


def quality_score(text_col: Column | str, n_chars_col: Column | str) -> Column:
    """Composite quality in [0,1]:
    0.4 * min(n_tokens/50, 1)        (length)
    + 0.3 * alpha_chars/n_chars      (alphabetic density)
    + 0.3 * min(stop_ratio*5, 1)     (natural-language-ness)
    """
    nc = F.col(n_chars_col) if isinstance(n_chars_col, str) else n_chars_col
    tc = F.col(text_col) if isinstance(text_col, str) else text_col
    n_tok = token_count(tc)
    alpha = F.length(F.regexp_replace(tc, "[^A-Za-z]", ""))
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    alpha_ratio = F.when(nc > 0, alpha / nc).otherwise(F.lit(0.0))
    stop_score = F.least(stopword_ratio(tc) * 5, F.lit(1.0))
    return F.lit(0.4) * len_score + F.lit(0.3) * alpha_ratio + F.lit(0.3) * stop_score


def bpe_token_count(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def fingerprint(text_col: Column | str) -> Column:
    """Polynomial rolling hash of the token stream (Karp-Rabin style):
    fold h -> (h*31 + code(token)) mod 2^31-1, code = ascii(first char)*256
    + len(token). Order-sensitive — permuted documents get different
    fingerprints (unlike bag-of-words hashes)."""
    code = lambda t: (F.ascii(t) * 256 + F.length(t)).cast("long")  # noqa: E731
    return F.aggregate(
        tokens(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 31 + code(t), F.lit(MERSENNE31)),
    )


# --- matching DuckDB SQL fragments (kept adjacent so they evolve together) --

SQL_TOKENS = "list_filter(regexp_split_to_array({col}, '[^A-Za-z]+'), t -> t <> '')"
SQL_STOPWORDS = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
SQL_STOP_RATIO = (
    "(CASE WHEN len({toks}) > 0 THEN "
    "CAST(len(list_filter(list_transform({toks}, t -> lower(t)), t -> list_contains(" + SQL_STOPWORDS + ", t))) AS DOUBLE)"
    " / len({toks}) ELSE 0.0 END)"
)


def sql_tokens(col: str) -> str:
    return SQL_TOKENS.format(col=col)


def sql_stop_ratio(col: str) -> str:
    return SQL_STOP_RATIO.format(toks=sql_tokens(col))


# ---------------------------------------------------------------------------
# PII scrubbing — redact emails / long digit runs / phone-shaped spans.
#
# Per-row regexp_replace chains: pure Column expressions, codegen'd, no
# shuffle — at 100 TB this is a map-only rewrite pass. Patterns stick to
# ASCII character classes with identical semantics in Java regex (Spark) and
# RE2 (DuckDB/others); no lookaround, no unicode classes. The fixture corpus
# contains no PII (verified — letters only), so the correctness gate is a
# pytest differential on constructed rows rather than a manifest query.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — permissive on purpose; redaction favors recall
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # international-ish phone: optional +, separators, 7+ digits total
    "phone": r"\+?[0-9][0-9()\-\. ]{5,}[0-9]",
    # any remaining run of 9+ digits (ids, SSN-like, card fragments)
    "digit_run": r"[0-9]{9,}",
}


def scrub_pii(text_col: Column | str, replacement: str = "<PII>") -> Column:
    """Text with every PII span replaced. Order matters: email before phone
    (an email's digits must not be half-eaten by the phone pattern),
    digit_run last as the catch-all."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name in ("email", "phone", "digit_run"):
        c = F.regexp_replace(c, PII_PATTERNS[name], replacement)
    return c


def pii_count(text_col: Column | str) -> Column:
    """Number of PII spans that scrub_pii would redact (for audit metrics).
    Counted on the progressively-scrubbed text so overlapping patterns are
    not double-counted — matches scrub_pii's replacement count exactly."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    total = F.lit(0)
    for name in ("email", "phone", "digit_run"):
        total = total + F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[name]), 0))
        c = F.regexp_replace(c, PII_PATTERNS[name], "<PII>")
    return total


def gram_positions(
    docs: "DataFrame",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """(id, pos, gh) — every k-token gram position with its 64-bit gram
    hash. The shared gram-formation step of crossdoc_repeated_grams and the
    materialized gram-index maintainer (streaming/gram_index.py): one
    posexplode (codegen) + one collect_list window over (doc, pos) ROWS k-1
    FOLLOWING — a single sort per doc partition, no HOF per-element
    re-evaluation (SURVEY.md §8.1). Only the fixed-width xxhash64 leaves
    the operator (collision odds at 64 bits are negligible against any
    realistic gram count); the gram text never shuffles."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("id"), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(Window.currentRow, k - 1)
    return (
        toks.select(
            "id",
            "pos",
            F.concat_ws(" ", F.collect_list("tok").over(w)).alias("gram"),
            F.count("tok").over(w).alias("glen"),
        )
        .where(F.col("glen") == k)
        .select("id", "pos", F.xxhash64("gram").alias("gh"))
    )


def crossdoc_repeated_grams(
    docs: "DataFrame",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Cross-document boilerplate signal: per doc, how many of its k-token
    grams also occur in at least one OTHER document.

    Substring-level duplication (shared license headers, navigation chrome,
    templated paragraphs) is invisible to document-level near-dup — two docs
    sharing one boilerplate paragraph have low overall Jaccard — and to the
    within-doc repetition filter (q62). The standard pipeline signal (the
    "duplicated n-gram fraction" family used by C4/Gopher-style cleaning,
    applied ACROSS documents) is the fraction of a doc's k-gram positions
    whose gram appears in >= 2 distinct docs.

    Spark shape: explode tokens with position (codegen), form each
    position's k-gram with one collect_list window over (doc, pos) ROWS
    k-1 FOLLOWING — a single sort per doc partition, no HOF per-element
    re-evaluation (SURVEY.md §8.1) — then one groupBy(gram) with
    approx-free COUNT(DISTINCT doc) over the gram index and a broadcast-
    friendly aggregate back per doc. The gram index shuffles
    (gram-hash, doc) pairs once; the MATERIALIZED twin for continuous
    ingest is streaming/gram_index.py:GramIndexMaintainer (per-batch
    gram-hash deltas incl. retroactive repeat credits, compaction, replay
    idempotence — the dedup_index.py treatment this docstring promised).

    Returns (id, n_grams, n_repeated, repeated_frac[round-6 double]),
    one row per doc with >= 1 full k-gram.
    """
    grams = gram_positions(docs, k, id_col, text_col)
    gram_docs = grams.select("gh", "id").distinct()
    repeated = (
        gram_docs.groupBy("gh")
        .agg(F.count("*").alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("gh")
    )
    per_pos = grams.join(repeated.withColumn("_r", F.lit(1)), "gh", "left")
    return (
        per_pos.groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("_r", F.lit(0))).alias("n_repeated"),
        )
        .select(
            "id",
            "n_grams",
            F.col("n_repeated").cast("bigint").alias("n_repeated"),
            F.round(F.col("n_repeated") / F.col("n_grams"), 6)
            .cast("decimal(9,6)")
            .cast("double")
            .alias("repeated_frac"),
        )
    )


def scrub_repeated_substrings(
    docs: "DataFrame",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """REMOVE cross-document duplicated substrings: delete every token
    position covered by any k-gram that occurs in >= 2 distinct docs — the
    surgical half of the exact-substring dedup family (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" ExactSubstr:
    cut the duplicated span, keep the rest of the doc), where
    crossdoc_repeated_grams only SCORES the duplication.

    A token at position p is covered iff some repeated gram STARTS in
    [p-k+1, p] — computed as a sliding window MAX of the start flag over
    ROWS k-1 PRECEDING, so span union costs one per-doc window pass, never
    an interval self-join.

    Spark shape: one posexplode + the gram_positions forward window
    (doc-partition sort #1), the corpus-wide repeated-gram set by
    partial-aggregated distinct-doc count on the 64-bit gram hash (gram
    text never shuffles), a hash join of positions against that set on gh,
    then the coverage window + kept-token reassembly riding the same
    doc-partition sort (#2). Three shuffles total (doc, gh, doc) at any
    scale; the scrubbed text is reassembled per doc and emitted as md5 so
    the manifest value-checks content without hauling megabytes.

    Returns (id, n_tokens, n_removed, scrubbed_md5), one row per doc with
    >= 1 token; scrubbed_md5 is md5 of the space-joined kept tokens (md5('')
    when everything was removed).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("id"), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    wf = Window.partitionBy("id").orderBy("pos").rowsBetween(Window.currentRow, k - 1)
    # gh is NULL at tail positions (< k tokens remain): they can start no
    # gram, so they take no flag — but they can still be COVERED below.
    grams = toks.select(
        "id",
        "pos",
        "tok",
        F.when(
            F.count("tok").over(wf) == k,
            F.xxhash64(F.concat_ws(" ", F.collect_list("tok").over(wf))),
        ).alias("gh"),
    )
    repeated = (
        grams.where(F.col("gh").isNotNull())
        .select("gh", "id")
        .distinct()
        .groupBy("gh")
        .agg(F.count("*").alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("gh", F.lit(1).alias("_r"))
    )
    flagged = grams.join(repeated, "gh", "left").select(
        "id", "pos", "tok", F.coalesce("_r", F.lit(0)).alias("flag")
    )
    wb = Window.partitionBy("id").orderBy("pos").rowsBetween(-(k - 1), Window.currentRow)
    covered = flagged.withColumn("covered", F.max("flag").over(wb))
    return (
        covered.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("covered").cast("long").alias("n_removed"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("covered") == 0,
                                    F.struct("pos", "tok"),
                                )
                            )
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("scrubbed_md5"),
        )
    )
