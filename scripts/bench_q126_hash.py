#!/usr/bin/env python
"""q126 gram-key representation walls: xxhash64 keys vs raw gram text
(VERDICT r11 #1's "bench row showing the delta").

At local SFs the wall difference is small — grams are short and the hash
adds map-side compute — so this script also prices what the shuffle
actually MOVES: per gram-join row, the text key is the raw 8-gram string
(averaging ~50 bytes on this corpus) where the hashed key is a fixed
8-byte long. At 100 TB the exchange is bandwidth-bound and that ratio is
the delta that matters; the wall numbers here pin that the hash costs
nothing locally.

Usage: python scripts/bench_q126_hash.py [--sf-dir /root/testdata/sf0.1]
       [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

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
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from mapreduce_paper_implementation_spark.functions.text import word_shingles
    from mapreduce_paper_implementation_spark.plans.release_queries import (
        _Q126_N,
        _q126_frame,
    )

    spark = get_spark("bench_q126_hash")
    docs = load_table(spark, args.sf_dir, "documents")
    docs.limit(10).collect()  # warmup

    # what the gram-join exchange moves per row, both representations
    stats = (
        docs.select(F.explode(word_shingles("text", _Q126_N)).alias("s"))
        .agg(
            F.count("*").alias("n_grams"),
            F.avg(F.length("s")).alias("avg_text_bytes"),
        )
        .collect()[0]
    )

    hashed_sec = _time(
        spark, lambda: _q126_frame(spark, args.sf_dir, hashed=True), args.repeat
    )
    text_sec = _time(
        spark, lambda: _q126_frame(spark, args.sf_dir, hashed=False), args.repeat
    )
    same = sorted(
        map(tuple, _q126_frame(spark, args.sf_dir, hashed=True).collect())
    ) == sorted(map(tuple, _q126_frame(spark, args.sf_dir, hashed=False).collect()))
    assert same, "hashed-gram q126 diverged from the text-joined variant"

    avg_text = float(stats["avg_text_bytes"])
    print(
        json.dumps(
            {
                "metric": "q126_gram_key_representation",
                "unit": "sec",
                "sf_dir": args.sf_dir,
                "repeat": args.repeat,
                "hashed_sec": hashed_sec,
                "text_sec": text_sec,
                "results_identical": same,
                "n_gram_rows": int(stats["n_grams"]),
                "avg_text_key_bytes": round(avg_text, 1),
                "hashed_key_bytes": 8,
                "shuffle_bytes_ratio_text_over_hash": round(avg_text / 8.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
