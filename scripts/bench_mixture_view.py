#!/usr/bin/env python
"""Mixture-planner view ingest/serve bench (round 14, VERDICT r13 ask #2):
measured evidence for streaming/mixture_view.py — per-batch ingest cost is
O(|batch|) (one per-source partial count + an O(#sources) state merge) and
stays flat as history grows, and the served q133 allocation is an
O(#sources) readout vs the batch planner's corpus re-scan.

Protocol: split the x10 scale corpus (50k docs) into N equal doc-id
batches through source_tokens_maintainer; time update() per batch
(late_vs_early ~1 = O(batch)); after the last batch, time
mixture_plan_view(m) (serve from counters) vs the batch
mixture_plan_readout(_mixture_alloc_frame(docs)) recompute over the full
corpus, asserting row equality.

Merges under a "mixture_view" key in BENCH_INGEST.json.

Usage: python scripts/bench_mixture_view.py [--docs-dir scale_data/x10/documents.parquet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_paper_implementation_spark.operators.caching import (  # noqa: E402
    free_local_checkpoints,
    release_persisted,
)
from mapreduce_paper_implementation_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--docs-dir",
        default=os.path.join(REPO, "scale_data", "x10", "documents.parquet"),
    )
    ap.add_argument("--n-batches", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_INGEST.json"))
    args = ap.parse_args()

    from mapreduce_paper_implementation_spark.plans.release_queries import (
        _mixture_alloc_frame,
        mixture_plan_readout,
    )
    from mapreduce_paper_implementation_spark.streaming.mixture_view import (
        mixture_plan_view,
        source_tokens_maintainer,
    )

    spark = get_spark("bench_mixture_view")
    docs = spark.read.parquet(args.docs_dir)
    n_docs = docs.count()
    step = n_docs // args.n_batches + 1

    def _rows(df):
        return sorted(tuple(r) for r in df.collect())

    with tempfile.TemporaryDirectory() as tmp:
        m = source_tokens_maintainer(spark, os.path.join(tmp, "state"))
        batch_secs = []
        for i in range(args.n_batches):
            lo, hi = i * step, (i + 1) * step
            batch = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            release_persisted()
            spark.catalog.clearCache()
            free_local_checkpoints(spark)
            t0 = time.perf_counter()
            m.update(batch, i + 1)
            batch_secs.append(round(time.perf_counter() - t0, 3))

        serve_rows, serve_secs = None, []
        for _ in range(args.repeat):
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            serve_rows = _rows(mixture_plan_view(m))
            serve_secs.append(round(time.perf_counter() - t0, 3))

        batch_rows, batch_rec_secs = None, []
        for _ in range(args.repeat):
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            batch_rows = _rows(mixture_plan_readout(_mixture_alloc_frame(docs)))
            batch_rec_secs.append(round(time.perf_counter() - t0, 3))

        assert serve_rows == batch_rows, "served allocation != batch q133 plan"

    section = {
        "docs_dir": os.path.relpath(args.docs_dir, REPO),
        "n_docs": n_docs,
        "n_batches": args.n_batches,
        "ingest_sec_per_batch": batch_secs,
        "late_vs_early": round(
            (sum(batch_secs[-3:]) / 3) / (sum(batch_secs[1:4]) / 3), 3
        ),
        "serve_sec": min(serve_secs),
        "batch_recompute_sec": min(batch_rec_secs),
        "note": (
            "ingest = per-source token partial count + O(#sources) state "
            "merge per batch; serve = water-filling allocation from "
            "maintained counters (no corpus read); batch_recompute = the "
            "registered q133 shape over the full corpus. Result equality "
            "asserted. late_vs_early ~1 = O(batch) ingest."
        ),
    }
    with open(args.out) as f:
        doc = json.load(f)
    doc["mixture_view"] = section
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"mixture_view": section}))


if __name__ == "__main__":
    main()
