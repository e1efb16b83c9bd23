#!/usr/bin/env python
"""Ingest-cost bench for the streaming index maintainers.

The maintainers' scale claim is O(|batch|) per ingest — cost must NOT grow
with accumulated history. This measures it: split the generated x10 corpus
(scripts/gen_scale.py: 50k docs / 20k vectors) into equal-size batches,
feed them through DedupIndexMaintainer, AnnIndexMaintainer, and
SeenKeysMaintainer (exact content-digest membership via the Bloom filter),
and record each batch's update() wall-clock, compacting every `compact_every` batches
(without compaction, delta-chain length adds a per-batch read cost that
compaction is exactly designed to bound).

Claim check in the artifact: `late_vs_early` = mean of the last 3 batch
times / mean of batches 2-4 (batch 1 excluded — it pays centroid training
/ first-index build). A maintainer re-paying history would show this ratio
growing toward n_batches; O(batch) shows ~1 give or take box noise.

Output: BENCH_INGEST.json at the repo root, echoed to stdout.

Usage:
    python scripts/bench_ingest.py [--factor 10] [--batches 10] [--compact-every 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from gen_scale import generate  # noqa: E402
from mapreduce_paper_implementation_spark.operators.caching import (  # noqa: E402
    release_persisted,
)
from mapreduce_paper_implementation_spark.session import get_spark  # noqa: E402
from mapreduce_paper_implementation_spark.sources.tables import load_table  # noqa: E402


def _ratio(times: list[float]) -> float | None:
    if len(times) < 7:
        return None
    early = times[1:4]  # skip batch 0: centroid training / first build
    late = times[-3:]
    return round(sum(late) / len(late) / (sum(early) / len(early)), 3)


def resolve_events_dir(out_dir: str, factor: float) -> str:
    """Events source for the event-stream maintainers: the scaled
    relational directory (gen_scale.generate_relational, e.g.
    scale_data/sf1 at factor 10) when it exists, else the base sf0.1
    fixture. ADVICE r07: previously hardcoded to sf0.1 regardless of
    --factor; the chosen source is now recorded in the artifact metadata
    so the ingest-cost rows say what they actually measured."""
    scaled = os.path.join(out_dir, f"sf{0.1 * factor:g}")
    if os.path.exists(os.path.join(scaled, "events.parquet")):
        return scaled
    return os.path.join(REPO, "..", "testdata", "sf0.1")


def _make_decontam(spark, state_dir: str, emb):
    """q116 serving-twin setup: train the shared centroids once (the q116
    build), install the % 29 eval slice as generation 0, return the
    maintainer. Setup cost lands in batch 0's neighborhood but is excluded
    from the timed loop (it happens at make() time, like ann_index's
    first-batch centroid training is excluded via the early-batch skip in
    _ratio)."""
    from mapreduce_paper_implementation_spark.operators.kmeans import kmeans_fit
    from mapreduce_paper_implementation_spark.streaming.decontam_index import (
        DecontamIndexMaintainer,
    )
    from pyspark.sql import functions as FF

    cents = kmeans_fit(
        emb, k=16, max_iter=2, tol=0.0, id_col="vec_id", vec_col="embedding"
    ).localCheckpoint()
    m = DecontamIndexMaintainer(spark, state_dir, cents)
    m.set_eval(emb.where(FF.col("vec_id") % 29 == 0), gen=0)
    return m


def run(spark, ds_dir: str, events_dir: str, n_batches: int, compact_every: int) -> dict:
    from mapreduce_paper_implementation_spark.streaming.ann_index import (
        AnnIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.bloom import (
        SeenKeysMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.dedup_index import (
        DedupIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.gram_index import (
        GramIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.transitions import (
        TransitionMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.rollup import (
        ab_counters_maintainer,
        day_value_hist_maintainer,
        digit_counts_maintainer,
        hll_vocab_maintainer,
        postings_maintainer,
        postings_replace_maintainer,
        quality_hist_maintainer,
        quantile_sketch_maintainer,
        user_day_maintainer,
        wordfreq_maintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.tri_index import (
        TriangleMaintainer,
    )

    docs = load_table(spark, ds_dir, "documents")
    emb = load_table(spark, ds_dir, "embeddings")
    # seen-keys ingest: exact content-digest membership per batch (the
    # "have we crawled this exact document before" check)
    hashed = docs.select("doc_id", F.md5("text").alias("content_hash"))
    # triangle ingest: the q87 link graph (user_id -> props.k) from the
    # events source (scaled relational dir when present — see
    # resolve_events_dir), arriving in event_id slices — the maintainer's
    # flat-cost claim is against ITS OWN growing edge history, so equal
    # batches matter more than the absolute corpus factor.
    tri_edges = (
        load_table(spark, events_dir, "events")
        .select(
            "event_id",
            F.col("user_id").alias("src"),
            F.get_json_object("props", "$.k").cast("bigint").alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    # transition ingest: the q88 event stream in TIME-ORDERED slices (the
    # maintainer's segment-monoid merge requires per-user batch ordering, so
    # slice by contiguous event_id range, not modulo interleave).
    base_events = load_table(spark, events_dir, "events")
    n_ev = base_events.agg(F.max("event_id")).collect()[0][0] + 1
    trans_events = base_events.withColumn(
        "slice_id", F.expr(f"event_id * {n_batches} div {n_ev}")
    )
    docs.limit(5).collect()  # untimed session warmup

    out: dict[str, dict] = {}
    for name, make, table, id_col, metric in (
        ("dedup_index", lambda s: DedupIndexMaintainer(spark, s), docs, "doc_id", None),
        ("gram_index", lambda s: GramIndexMaintainer(spark, s), docs, "doc_id", None),
        ("ann_index", lambda s: AnnIndexMaintainer(spark, s), emb, "vec_id", None),
        (
            "seen_keys",
            lambda s: SeenKeysMaintainer(spark, s, ["content_hash"]),
            hashed,
            "doc_id",
            lambda df: df.where("seen").count(),
        ),
        ("tri_index", lambda s: TriangleMaintainer(spark, s), tri_edges, "event_id", None),
        # slice_id is already in [0, n_batches): the modulo predicate is an
        # identity match, preserving the time-ordered contract
        (
            "transitions",
            lambda s: TransitionMaintainer(spark, s),
            trans_events,
            "slice_id",
            lambda _res: 0,  # update() returns None (rollup convention)
        ),
        # additive-count serving twins (q103/q104/q107): state bounded by
        # the score/counter domain, merge cost = state + batch, no history
        # re-read — slices are modulo (no ordering contract, pure monoids)
        (
            "quality_hist",
            lambda s: quality_hist_maintainer(spark, s),
            docs,
            "doc_id",
            lambda _res: 0,
        ),
        # q111's retrieval index: postings are additive, but the state is
        # O(docs x distinct terms) — the largest maintained state here, so
        # its flat-cost claim is the most load-bearing
        (
            "postings",
            lambda s: postings_maintainer(spark, s),
            docs,
            "doc_id",
            lambda _res: 0,
        ),
        (
            "ab_counters",
            lambda s: ab_counters_maintainer(spark, s),
            base_events,
            "event_id",
            lambda _res: 0,
        ),
        (
            "digit_counts",
            lambda s: digit_counts_maintainer(spark, s),
            base_events,
            "event_id",
            lambda _res: 0,
        ),
        (
            "day_value_hist",
            lambda s: day_value_hist_maintainer(spark, s),
            base_events,
            "event_id",
            lambda _res: 0,
        ),
        # q96's engagement set: state = distinct (user, day) — merge is a
        # set union whose cost tracks state + batch, idempotent by design
        (
            "user_day",
            lambda s: user_day_maintainer(spark, s),
            base_events,
            "event_id",
            lambda _res: 0,
        ),
        # replace-semantics retrieval index: max-version arbitration is a
        # groupBy(doc).max(ver) + equi-join over state — flat per batch
        (
            "postings_replace",
            lambda s: postings_replace_maintainer(spark, s),
            docs.withColumn("crawl_ver", F.lit(0)),
            "doc_id",
            lambda _res: 0,
        ),
        # q114's vocabulary sketch: register-max lattice, state is
        # O(sources x 2^lgK) bytes — merge cost cannot grow with history
        (
            "hll_vocab",
            lambda s: hll_vocab_maintainer(spark, s),
            docs,
            "doc_id",
            lambda _res: 0,
        ),
        # q115's training input: (w, freq) counter state — merge cost is
        # state + batch (vocabulary-bounded), never a corpus re-read
        (
            "wordfreq",
            lambda s: wordfreq_maintainer(spark, s),
            docs,
            "doc_id",
            lambda _res: 0,
        ),
        # q120's rank sketch: O(groups x k log n) compactor state — merge
        # folds sketch rows, cost tracks state + batch, never history
        (
            "quantile_sketch",
            lambda s: quantile_sketch_maintainer(spark, s),
            base_events,
            "event_id",
            lambda _res: 0,
        ),
        # q116's serving twin: per batch = assign (frozen centroids) +
        # map-side probe vs the broadcast eval index + delta fold — the
        # cells store is append-only, so history is never re-read
        (
            "decontam_index",
            lambda s: _make_decontam(spark, s, emb),
            emb.where(F.col("vec_id") % 29 != 0),
            "vec_id",
            lambda _res: 0,
        ),
    ):
        state = tempfile.mkdtemp(prefix=f"ingest_{name}_")
        m = make(state)
        times: list[float] = []
        pair_total = 0
        for bid in range(n_batches):
            batch = table.where(F.col(id_col) % n_batches == bid)
            t0 = time.perf_counter()
            res = m.update(batch, bid)
            pair_total += metric(res) if metric else res.count()
            times.append(round(time.perf_counter() - t0, 2))
            if compact_every and (bid + 1) % compact_every == 0:
                # chain maintainers fold deltas; versioned maintainers have
                # no chain — their "compaction" is dropping superseded
                # versions (vacuum), the analogous disk-bound operation
                maint = getattr(m, "compact", None) or getattr(m, "vacuum")
                maint()
            release_persisted()
            spark.catalog.clearCache()
        shutil.rmtree(state, ignore_errors=True)
        out[name] = {
            "batch_sec": times,
            "pairs_found": pair_total,
            "late_vs_early": _ratio(times),
        }
    return out


def run_topology(spark, ds_dir: str, n_batches: int) -> dict:
    """The composed daily-ingest topology end to end (VERDICT r07 ask #8),
    at corpus scale: per batch, documents flow through the exact
    content-digest gate (SeenKeysMaintainer) -> near-dup index probe
    (DedupIndexMaintainer) -> gram-index + quality-histogram maintenance on
    the novel remainder, while the batch's embeddings feed the ANN index —
    every maintainer wrapped in its declarative MaintenancePolicy
    (compact-at-chain-length for chain maintainers, vacuum for versioned).
    The claim under test is the COMPOSITION's O(batch) cost: per-batch
    wall-time must stay flat as ten batches of history accumulate
    (late_vs_early ~ 1), policies firing included."""
    from mapreduce_paper_implementation_spark.streaming.ann_index import (
        AnnIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.bloom import (
        SeenKeysMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.dedup_index import (
        DedupIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.gram_index import (
        GramIndexMaintainer,
    )
    from mapreduce_paper_implementation_spark.streaming.policy import (
        MaintainedIngest,
        MaintenancePolicy,
    )
    from mapreduce_paper_implementation_spark.streaming.rollup import (
        quality_hist_maintainer,
    )

    docs = load_table(spark, ds_dir, "documents")
    emb = load_table(spark, ds_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="ingest_topology_")
    chain_pol = lambda: MaintenancePolicy(compact_after_n_deltas=3)  # noqa: E731
    seen = MaintainedIngest(
        SeenKeysMaintainer(spark, f"{root}/seen", ["content_hash"]), chain_pol()
    )
    index = MaintainedIngest(
        DedupIndexMaintainer(spark, f"{root}/index", threshold=0.8), chain_pol()
    )
    grams = MaintainedIngest(
        GramIndexMaintainer(spark, f"{root}/grams", k=10), chain_pol()
    )
    qhist = MaintainedIngest(
        quality_hist_maintainer(spark, f"{root}/qhist"),
        MaintenancePolicy(vacuum_keep=1),
    )
    ann = MaintainedIngest(
        AnnIndexMaintainer(spark, f"{root}/ann"), chain_pol()
    )

    docs.limit(5).collect()  # untimed warmup
    times: list[float] = []
    n_flagged = 0
    for bid in range(n_batches):
        dbatch = docs.where(F.col("doc_id") % n_batches == bid).withColumn(
            "content_hash", F.md5("text")
        )
        ebatch = emb.where(F.col("vec_id") % n_batches == bid)
        t0 = time.perf_counter()
        tagged = seen.update(dbatch, bid)
        novel = tagged.where(~F.col("seen")).select("doc_id", "text", "source", "n_chars")
        dups = index.update(novel, bid)
        n_flagged += dups.count()
        grams.update(novel.select("doc_id", "text"), bid)
        qhist.update(novel, bid)
        ann.update(ebatch, bid)
        times.append(round(time.perf_counter() - t0, 2))
        release_persisted()
        spark.catalog.clearCache()
    events = {
        name: [(e.batch_id, e.action) for e in m.events]
        for name, m in (
            ("seen", seen),
            ("index", index),
            ("grams", grams),
            ("qhist", qhist),
            ("ann", ann),
        )
    }
    shutil.rmtree(root, ignore_errors=True)
    return {
        "batch_sec": times,
        "near_dups_flagged": n_flagged,
        "late_vs_early": _ratio(times),
        "policy_events": events,
    }


# The pagerank section always streams the BASE fixture events (see the NOTE
# inside run_pagerank: replicated scale dirs are edge-set no-ops), so its
# DEFAULT source is the base fixture rather than the script's
# --out-dir/--factor args (ADVICE r10); overridable via
# --pagerank-events-dir (ADVICE r11 residual promoted to an argument).
PAGERANK_EVENTS_DIR = "/root/testdata/sf0.1"


def run_pagerank(spark, events_dir: str, n_batches: int) -> dict:
    """PageRankMaintainer ingest (VERDICT r09 ask #3). Its cost contract
    DIFFERS from the flat-cost maintainers above: each update folds the
    edge delta in O(|delta|) (event history never re-read) and then
    re-converges the rank vector, which is intrinsically O(warm_iters x
    |E_so_far|) — so batch wall-time is NOT expected to stay flat. The
    measured claims are (a) warm_iters per batch FALLS as the graph
    stabilizes, and (b) the final warm re-convergence beats a cold uniform
    start over the same graph (cold_iters recorded for the ratio)."""
    from mapreduce_paper_implementation_spark.operators.graph import (
        pagerank_fixpoint,
    )
    from mapreduce_paper_implementation_spark.streaming.pagerank_index import (
        PageRankMaintainer,
    )

    # NOTE: the BASE fixture stream, not the replicated scale dir — whole-copy
    # replication repeats the same (user_id, props.k) edges under fresh
    # event_ids, so every slice after the first would be an edge-set NO-OP
    # (warm_iters=1 trivially: measured before this fix). The original
    # stream's contiguous slices keep adding fresh edges, which is the
    # scenario the warm-start claim is about.
    edges = (
        load_table(spark, events_dir, "events")
        .select(
            "event_id",
            F.col("user_id").alias("src"),
            F.get_json_object("props", "$.k").cast("bigint").alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    n_ev = edges.agg(F.max("event_id")).collect()[0][0] + 1
    state = tempfile.mkdtemp(prefix="ingest_pagerank_")
    m = PageRankMaintainer(spark, state)
    times: list[float] = []
    warm_iters: list[int] = []
    for bid in range(n_batches):
        # contiguous event_id slices: a realistic "links crawled today" delta
        batch = edges.where(
            F.expr(f"event_id * {n_batches} div {n_ev}") == bid
        ).select("src", "dst")
        t0 = time.perf_counter()
        it = m.update(batch, bid)
        times.append(round(time.perf_counter() - t0, 2))
        warm_iters.append(it)
        release_persisted()
        spark.catalog.clearCache()
    _, cold_iters = pagerank_fixpoint(m.edges())
    shutil.rmtree(state, ignore_errors=True)
    return {
        "batch_sec": times,
        "warm_iters": warm_iters,
        "cold_iters_full_graph": cold_iters,
        # cold_iters is None when the cold fixpoint hit max_iter without
        # converging — record the ratio as unavailable instead of raising
        # after the multi-minute batch loop already ran (ADVICE r10)
        "last_warm_vs_cold": (
            round(warm_iters[-1] / cold_iters, 3) if cold_iters else None
        ),
    }


def _load_or_empty(path: str) -> dict:
    """Read the standing artifact, tolerating absence AND a truncated/
    corrupt file (a killed previous run's non-atomic write must not crash
    THIS run after its multi-minute measurements complete)."""
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--compact-every", type=int, default=3)
    ap.add_argument("--out-dir", default=os.path.join(REPO, "scale_data"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_INGEST.json"))
    ap.add_argument("--pagerank-events-dir", default=PAGERANK_EVENTS_DIR)
    ap.add_argument(
        "--topology-only",
        action="store_true",
        help="run ONLY the composed topology at --factor and MERGE it into "
        "the standing artifact under topology_x<factor> (VERDICT r08 ask "
        "#9: the x100 run — 500k docs in 10 batches — without re-running "
        "the factor-10 maintainer rows)",
    )
    ap.add_argument(
        "--pagerank-only",
        action="store_true",
        help="re-run ONLY the pagerank_index section (base-fixture event "
        "stream) and merge it into the standing artifact",
    )
    args = ap.parse_args()

    ds_dir = os.path.join(args.out_dir, f"x{args.factor:g}")
    if not os.path.exists(os.path.join(ds_dir, "truth.json")):
        generate(args.factor, args.out_dir)

    if args.pagerank_only:
        spark = get_spark("bench_ingest")
        pr = run_pagerank(spark, args.pagerank_events_dir, args.batches)
        result = _load_or_empty(args.out)
        result["pagerank_index"] = pr
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({"pagerank_index": pr}))
        return

    if args.topology_only:
        spark = get_spark("bench_ingest")
        topo = run_topology(spark, ds_dir, args.batches)
        result = _load_or_empty(args.out)  # fresh/corrupt: don't discard the run
        result[f"topology_x{args.factor:g}"] = {"factor": args.factor, **topo}
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({f"topology_x{args.factor:g}": result[f"topology_x{args.factor:g}"]}))
        return

    events_dir = resolve_events_dir(args.out_dir, args.factor)
    spark = get_spark("bench_ingest")
    result = {
        "metric": "maintainer_ingest_cost",
        "unit": "sec_per_batch",
        "factor": args.factor,
        "events_source": os.path.normpath(events_dir),
        "n_batches": args.batches,
        "compact_every": args.compact_every,
        "maintainers": run(spark, ds_dir, events_dir, args.batches, args.compact_every),
        "topology": run_topology(spark, ds_dir, args.batches),
        "pagerank_index": run_pagerank(spark, args.pagerank_events_dir, args.batches),
    }
    # a full refresh must not drop the separately-generated topology_x*
    # sections (bench_ingest --topology-only --factor 100); carried
    # sections keep whatever code vintage they were measured on — rerun
    # --topology-only to refresh them
    for k2, v2 in _load_or_empty(args.out).items():
        if k2.startswith("topology_x"):
            result[k2] = v2
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
