#!/usr/bin/env python
"""q124 leakage-safe split: inline vs release-cut-over-materialized-labels
walls (the q78 inline-vs-materialized pattern applied to the split).

The registered q124 rebuilds the near-dup pair graph + connected
components inline, so its manifest row carries the whole clustering
pipeline's cost. Production maintains the (id, component) label map
incrementally (streaming/cc_index.py; per-batch cost O(delta)) and takes
the split at a RELEASE CUT: cluster_split_view = the same
operators/serving.py:cluster_split_assign tail over the stored labels —
a broadcast-scale join + map-only md5 arithmetic, never a re-cluster.
This script records both walls (and the label-map build separately) and
asserts the assignments identical.

Usage: python scripts/bench_q124_cut.py [--sf-dir /root/testdata/sf0.1]
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
        ngram_jaccard_pairs,
    )
    from mapreduce_paper_implementation_spark.operators.graph import (
        connected_components,
    )
    from mapreduce_paper_implementation_spark.operators.serving import (
        cluster_split_assign,
    )

    spark = get_spark("bench_q124_cut")
    docs = load_table(spark, args.sf_dir, "documents")
    docs.limit(10).collect()  # warmup

    def inline():
        return cluster_split_assign(
            docs, connected_components(ngram_jaccard_pairs(docs, threshold=0.1))
        )

    inline_sec = _time(spark, inline, args.repeat)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "labels.parquet")
        t0 = time.perf_counter()
        connected_components(
            ngram_jaccard_pairs(docs, threshold=0.1)
        ).write.mode("overwrite").parquet(path)
        build_sec = round(time.perf_counter() - t0, 3)
        release_persisted()
        spark.catalog.clearCache()

        labels = spark.read.parquet(path)
        cut_sec = _time(
            spark, lambda: cluster_split_assign(docs, labels), args.repeat
        )
        same = sorted(
            map(tuple, cluster_split_assign(docs, labels).collect())
        ) == sorted(map(tuple, inline().collect()))

    assert same, "release-cut assignment diverged from the inline rebuild"
    print(
        json.dumps(
            {
                "metric": "q124_inline_vs_release_cut",
                "unit": "sec",
                "sf_dir": args.sf_dir,
                "repeat": args.repeat,
                "inline_sec": inline_sec,
                "label_map_build_sec": build_sec,
                "release_cut_sec": cut_sec,
                "results_identical": same,
            }
        )
    )


if __name__ == "__main__":
    main()
