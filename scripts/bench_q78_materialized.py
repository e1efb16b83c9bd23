#!/usr/bin/env python
"""q78 canonical-docs: inline vs materialized-cluster-input walls
(VERDICT r08 ask #5).

The registered q78 rebuilds the near-dup cluster graph inline (shingle
self-join + connected components + argmax) so the manifest row carries the
whole pipeline's cost — the slowest standing row. Production runs q41 once
per ingest and passes the MATERIALIZED (id, component) map to
operators/dedup.canonical_docs(clusters=...), so the per-query cost is just
quality projection + member join + argmax. This script records both walls
(and the map-build cost separately) so BASELINE.md can show the production
shape next to the inline row; results are asserted identical.

Usage: python scripts/bench_q78_materialized.py [--sf-dir /root/testdata/sf0.1]
       [--repeat 3]
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

from mapreduce_paper_implementation_spark.operators.caching import (  # noqa: E402
    release_persisted,
)
from mapreduce_paper_implementation_spark.session import get_spark  # noqa: E402
from mapreduce_paper_implementation_spark.sources.tables import load_table  # noqa: E402


def _time(spark, fn, repeat: int) -> float:
    best = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        release_persisted()
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from mapreduce_paper_implementation_spark.operators.dedup import (
        canonical_docs,
        ngram_jaccard_pairs,
    )
    from mapreduce_paper_implementation_spark.operators.graph import (
        connected_components,
    )

    spark = get_spark("bench_q78")
    docs = load_table(spark, args.sf_dir, "documents")
    docs.limit(10).collect()  # warmup

    inline_sec = _time(spark, lambda: canonical_docs(docs, threshold=0.1), args.repeat)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "clusters.parquet")
        t0 = time.perf_counter()
        connected_components(
            ngram_jaccard_pairs(docs, threshold=0.1)
        ).write.mode("overwrite").parquet(path)
        build_sec = round(time.perf_counter() - t0, 3)
        release_persisted()
        spark.catalog.clearCache()

        clusters = spark.read.parquet(path)
        mat_sec = _time(
            spark,
            lambda: canonical_docs(docs, clusters=clusters, threshold=0.1),
            args.repeat,
        )
        same = sorted(
            map(tuple, canonical_docs(docs, clusters=clusters, threshold=0.1).collect())
        ) == sorted(map(tuple, canonical_docs(docs, threshold=0.1).collect()))

    assert same, "materialized-cluster path diverged from the inline rebuild"
    print(
        json.dumps(
            {
                "metric": "q78_inline_vs_materialized_clusters",
                "unit": "sec",
                "sf_dir": args.sf_dir,
                "repeat": args.repeat,
                "inline_sec": inline_sec,
                "cluster_map_build_sec": build_sec,
                "materialized_sec": mat_sec,
                "results_identical": same,
            }
        )
    )


if __name__ == "__main__":
    main()
