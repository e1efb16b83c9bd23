#!/usr/bin/env python
"""Planted-skew join bench (VERDICT r07 ask #4): exercise
operators/skew.py:salted_join under ACTUAL skew and record the straggler
effect, vs AQE's built-in skew-join splitting.

Scenario: a Zipf-extreme event join — `big` has n_rows rows (default 60M)
of which 90% (default --hot-frac 0.9) carry ONE hot user_id (the key a viral user or a null-sentinel produces at
100 TB), joined to a 100k-row per-user dim. No side broadcasts
(autoBroadcastJoinThreshold=-1 — the 100 TB regime). Three physical plans:

- plain_no_aqe: static SortMergeJoin — the hot key's partition holds 90%
  of the big side, one task IS the job (the straggler the reference's
  fixed `ihash % nReduce` bucketing cannot avoid, mr/worker.go:25-29);
- plain_aqe_skew: AQE skew-join splitting enabled with thresholds tuned to
  this data size (the production default path on Spark 3.2+);
- salted_32: salted_join — big side salts 32 ways, dim explodes 32x, the
  hot key spreads over 32 tasks regardless of AQE availability.

All three must return identical aggregates (asserted); wall-clock is
best-of-N. The expected reading: plain_no_aqe >> {plain_aqe_skew,
salted_32}, proving the salted path BEATS the straggler plan rather than
merely equaling it — scripts/bench_scale.py's corpora can't show this
(their Zipf sources skew scan volume, not join keys).

Output: skew_join section printed and (default) merged into
BENCH_SCALE.json under "skew_join".

Usage: python scripts/bench_skew.py [--rows 60000000] [--users 100000]
       [--hot-frac 0.9] [--repeat 2] [--merge-into /root/repo/BENCH_SCALE.json]
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

from mapreduce_paper_implementation_spark.operators.skew import salted_join  # noqa: E402
from mapreduce_paper_implementation_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    # 60M x 0.9: sized so the hot partition (~54M rows, single task) clearly
    # dominates the static plan — at 20M x 0.8 the parallel scan/shuffle
    # hides the straggler (measured 5.6 vs 5.5 s; at these defaults it is
    # 42 vs 8 s)
    ap.add_argument("--rows", type=int, default=60_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--hot-frac", type=float, default=0.9)
    ap.add_argument("--salts", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--merge-into", default=os.path.join(REPO, "BENCH_SCALE.json")
    )
    args = ap.parse_args()

    spark = get_spark("bench_skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    hot_mod = max(2, round(1.0 / (1.0 - args.hot_frac)))
    # deterministic planted skew: rows where id % hot_mod != 0 all carry
    # user_id 0 (the hot key); the rest spread uniformly over the dim
    big = spark.range(args.rows).select(
        F.when(F.col("id") % hot_mod != 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(args.users)))
        .alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    dim = spark.range(args.users).select(
        F.col("id").alias("user_id"),
        ((F.col("id") % 13) + 1).cast("double").alias("weight"),
    )

    def _agg(joined):
        return joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value") * F.col("weight")).alias("wv"),
        ).collect()[0]

    def _timed(fn):
        best, out = None, None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            res = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            out = res
        return round(best, 2), out

    results: dict[str, dict] = {}

    # 1. static SMJ, the straggler plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t, r1 = _timed(lambda: _agg(big.join(dim, "user_id")))
    results["plain_no_aqe"] = {"wall_sec": t}

    # 2. AQE skew-join splitting, thresholds sized to this demo's data
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    t, r2 = _timed(lambda: _agg(big.join(dim, "user_id")))
    results["plain_aqe_skew"] = {"wall_sec": t}

    # 3. salted join — no AQE assistance
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t, r3 = _timed(
        lambda: _agg(salted_join(big, dim, "user_id", n_salts=args.salts))
    )
    results[f"salted_{args.salts}"] = {"wall_sec": t}
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    assert r1["n"] == r2["n"] == r3["n"] == args.rows, (r1, r2, r3)
    # all three weighted aggregates, not just plain-vs-salted: the AQE
    # variant's answer is part of the "identical aggregates" claim too
    assert abs(r1["wv"] - r2["wv"]) < 1e-6 * abs(r1["wv"]), (r1, r2)
    assert abs(r1["wv"] - r3["wv"]) < 1e-6 * abs(r1["wv"]), (r1, r3)

    salted_t = results[f"salted_{args.salts}"]["wall_sec"]
    out = {
        "scenario": {
            "rows": args.rows,
            "users": args.users,
            "hot_frac": round(1 - 1 / hot_mod, 3),
            "n_salts": args.salts,
            "repeat": args.repeat,
            "broadcast": "disabled",
        },
        "results": results,
        "salted_vs_straggler": round(
            salted_t / results["plain_no_aqe"]["wall_sec"], 3
        ),
        "aqe_vs_straggler": round(
            results["plain_aqe_skew"]["wall_sec"]
            / results["plain_no_aqe"]["wall_sec"],
            3,
        ),
        "salted_beats_plain": salted_t < results["plain_no_aqe"]["wall_sec"],
    }
    print(json.dumps(out, indent=1))

    if args.merge_into and os.path.exists(args.merge_into):
        with open(args.merge_into) as f:
            doc = json.load(f)
        doc["skew_join"] = out
        with open(args.merge_into, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"# merged into {args.merge_into}", file=sys.stderr)


if __name__ == "__main__":
    main()
