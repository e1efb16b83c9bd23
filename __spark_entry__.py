"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduce_paper_implementation_spark/``; this file
is a thin adapter. Queries q01-q17 are the declared manifest (SURVEY.md §2D);
q18-q54 widen the reference + capability surface (dedup / similarity / text
analysis / sessionization / joins / windows / subqueries); q55-q71 are the
training-data-pipeline layer (decontamination, splits, mixture, packing,
quality filters, quantization, sketches, incremental rollup/near-dup,
stratified sampling) in ``plans/pipeline_queries.py``; q72 is SemDeDup-style
semantic dedup within trained k-means cells; q73 is Bloom-gated ingest
membership (delta keys vs history without shuffling history); q74 is
PageRank with exact scaled-integer arithmetic (bit-identical across engines
and partitionings); q75 is cross-document boilerplate detection (repeated
10-gram fraction); q76 materializes the q57 mixture as a deterministic
weighted sample; q77 is the keyed MERGE upsert (full-outer + presence-flag
arbitration, tombstone deletes); q78 is canonical-document selection
(argmax-quality per near-dup cluster); q79-q87 are the curation tranche in
``plans/curation_queries.py`` (PII scrub audit, mergeable histogram
quantiles, context-window chunking, bigram collocations, embedding
outliers, funnel attribution, retention cohorts, exact substring-run
scrubbing, degree-oriented triangle counting); q88-q93 extend it with the
behavioral/warehouse tranche (Markov event transitions — streaming twin in
``streaming/transitions.py`` —, lexical entropy/TTR quality stats, SCD
type-2 change history, NTILE value deciles, k-anonymity QI audit,
per-source KL length-distribution drift); q94-q97 add item-item
co-occurrence cosine neighborhoods, median/MAD robust outliers, sliding
7-day distinct users (contribution expansion), and degree assortativity;
q98 is CDC snapshot diff (full-outer change classification), q99 is
calendar-spine gap fill with LOCF, q100 is blocked-Levenshtein typo
near-dup, q101 is largest-remainder click attribution in exact cents;
q102-q104 add frontier BFS reachability (recursive-CTE oracle),
per-source adaptive quality thresholds (exact histogram quantile, no
per-doc sort), and a hash-bucketed A/B test readout with a pooled
two-proportion z statistic; q105-q107 add n-gram containment dedup
(the asymmetric overlap-coefficient rung of the dedup ladder),
transition-model perplexity scoring (the KenLM-perplexity-filter
analog), and a Benford first-digit ingest audit; q108-q109 add
trigram path mining (rank the bounded aggregate, never the stream)
and the cross-source near-dup leakage matrix (pair set broadcasts,
corpus map streams); q110 is the histogram-cutpoint decile assignment
(q91's no-sort 100 TB path, cutpoint algebra pinned hash-exact); q111 is
BM25 ranked retrieval over a corpus-derived query (postings semi-join,
O(5)-term broadcast, rank-the-rounded-score); q112 is the rolling 7-day
exact p95 (bounded histogram + contribution expansion, integer rank rule);
q113 is a deterministic Efraimidis-Spirakis weighted sample (hash-derived
uniforms, per-source top-k via the bounded key histogram's cutoff — never
a corpus rank); q114 is the per-source vocabulary-size audit (exact
distinct + DataSketches HLL estimate bracket-pinned by the oracle, the
sketch being the maintained 100 TB path); q115 is distributed BPE
merge-table training (one corpus shuffle, then bounded pair-count rounds
over the word-type table; oracle = 10 unrolled merge rounds); q116 is
semantic decontamination (q55's embedding twin: within shared trained
k-means cells, eval side broadcast, corpus never shuffles); q117 pins the
Unicode category-L tokenize path against a planted multilingual fixture;
q118 is IVF-PQ quantized ANN (per-subspace codebooks, exact-decimal ADC
scoring inside the q29 coarse probe; the deepest unrolled oracle in the
manifest); q119 segments the corpus under the q115-learned merge table
(train feeding apply in one lazy pipeline — map-only broadcast-merge
apply, per-source subword/fertility stats; oracle shares q115's unrolled
training CTEs); q120 is the mergeable rank sketch for unbounded-precision
quantiles (deterministic compactor, weight-exact merge, bracket-pinned
vs the exact order statistic); q121 is unigram-LM tokenizer training
(SentencePiece-unigram hard-EM; since round 12 the query emits the
invariant READOUT — SQL-exact anchors + pinned-TRUE coverage/mass/bound
booleans, the q120 est_ok pattern — so it is fully oracle-gated while
the Viterbi-derived piece table stays differential-gated by a
pure-Python EM replay); q122 is corpus-scale
greedy longest-match segmentation (the WordPiece apply rule) under the
deterministic unigram SEED vocabulary — q121's apply side, fully
oracle-gated (jump-table join + recursive-CTE walk), with the EM-trained
table covered by the same operator's pure-Python differential; q124 is
the leakage-safe train/valid/test split (q56's hash rule applied at the
q41 near-dup-CLUSTER granularity so no near-dup pair straddles the
train/eval boundary — doc-rule leakage reported side-by-side, cluster
rule pinned to zero; oracle shares q41's recursive-CTE closure); q125 is
balanced training-shard export (rank striping under the md5 permutation
via the TeraSort-shaped global rank — exact ±1 balance, contrasted with
hash sharding's binomial spread in the same output); q123 segments the
corpus under the EM-TRAINED q121 table (since round 12 it emits the
per-source invariant readout — exact word/char totals the oracle
recomputes, the totals the round-11 pytest pinned equal to q122's, plus
pinned-TRUE piece-bracket and vocabulary-membership booleans — same
greedy operator q122 hash-gates end-to-end); q126 is the residual
cross-split contamination audit (8-gram overlap across the train/eval
boundary for BOTH split rules — the measured residue q124's cluster
split leaves and the q55 gate then scrubs; the corpus-scale join moves
xxhash64 gram hashes, the text-joined oracle doubling as the collision
audit; streaming twin streaming/contamination_index.py with retroactive
re-emission); q127 is the composed release cut (split -> lexical +
semantic boundary decontamination -> per-source quality cut -> balanced
shard export in ONE lazy pipeline off the cluster label map, per-(split,
shard) docs/tokens plus the scrub ledger — the cross-operator-drift
gate); q128/q129 are the multilingual tokenizer twins (BPE training and
corpus segmentation over Unicode \\p{L} tokens of the corpus UNIONed
with q117's planted fixture, under the sentinel symbol regex — the
train->apply loop generalized past ASCII); q130/q131 complete the
multilingual ladder for the UNIGRAM family (q122's hash-gated
seed-vocabulary greedy apply and q123's trained-apply invariant readout
over the same unicode union corpus — round 13). Round 13 also adds the
production artifact surfaces around these queries: the published ANN
release index (operators/ann_release.py, $SPARK_GRAFT_ANN_INDEX — q118/
q116/q127 read trained centroids/codebooks/cells/codes instead of
retraining inline, bit-identical), the q127 shard exporter
(sources/release_export.py — per-(split,shard) parquet + counts/ledger
manifest behind an atomic pointer), and the incremental release-cut view
(streaming/release_view.py — q127 served from maintained state, equal to
the one-shot after every ingest batch); q132 is TOKEN-balanced shard
export via the new distributed prefix-sum (parallel scan) primitive —
shard boundaries at equal cumulative-token targets, spread bounded by
one boundary document, the q125 trade inverted; q133 is the
token-budget mixture planner (exact water-filling under per-source
epoch caps over the bounded source table — the data-mixing step ahead
of the release cut) and q134 materializes that plan as the budgeted
sample (full epochs + md5-order remainder head per source, per-source
offsets from one global prefix-sum — the repetition schedule a
data-constrained training run actually consumes); q135 (round 14) is the
INDEXED production path of q118 as its own gated row — IVF-PQ artifacts
always read from a published release index ($SPARK_GRAFT_ANN_INDEX or a
per-corpus scratch publication built once), plan pinned to contain no
training, identical rows to q118 under the shared oracle; q136 (round
14) is the WRITE side of the budgeted mixture — the materialized
repeated-epoch doc stream (copy expansion by map-side explode, epochs =
full passes + the md5-order head pass) cut into TOKEN-balanced shards
within each epoch via one global prefix-sum with bounded per-epoch
offset broadcasts; sources/mixture_export.py writes that exact frame as
hive-partitioned (epoch, shard) parquet + manifest behind an atomic
pointer, and streaming/mixture_view.py re-derives q133's water-filling
allocation from additive per-source token counters at O(#sources) serve
cost; q137 (round 14) is the context-cap planner — the exact
truncation-loss / padding-waste / utilization tradeoff per candidate
context length under the one-doc-per-sequence loader, computed in ONE
corpus pass (map-side explode of the 5-literal cap array into a 5-group
aggregate); q138 (round 14) is the dedup-threshold tuning curve — pairs
fired and docs linked per candidate Jaccard cutoff 0.1..0.9, derived
from ONE q20 exact similarity join (threshold comparison in integer
micro units so double-vs-decimal literal semantics can never split the
engines).
ALL queries are DuckDB-oracle-backed (since round 12) — including q34,
whose HLL++ sketch is value-checked via a 3-sigma bracket boolean (the
sketch estimate itself is estimator-specific by design), and q121/q123,
whose non-SQL-expressible trained tables are gated through their
SQL-expressible invariant readouts. Honest grading of that last gate
(round-13 ADVICE note): within the q121/q123 readouts, the columns the
oracle GENUINELY recomputes are the exact anchors (word/char totals,
n_words/n_chars per source) plus chars_covered/mass_conserved; the
remaining booleans (n_pieces_ok, multi_pieces_positive, q123's
subwords_bracket_ok) are pinned TRUE by the same engine code path that
produces them, so the hash gate can never fail on those alone — the
trained table itself is additionally differential-gated by the
pure-Python EM replay in tests/test_greedy_segment.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_paper_implementation_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 5-way star join with
    broadcast dimensions (Q11, TPC-H Q5 shape)."""
    return QUERIES["q11_regional_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get the
    driver's weaker rows-only check)."""
    return dict(ORACLES)
