#!/usr/bin/env python
"""Bucketed-catalog bench (VERDICT r07 ask #2): wall-times for q10/q11/q98
in three layouts at sf0.1, feeding the BASELINE.md bucketed-catalog note.

Per query:
- "registered": the manifest query as bench.py runs it (broadcast enabled —
  the small-sf production plan);
- "shuffle":    the same shape with autoBroadcastJoinThreshold=-1 (the
  100 TB plan, where no fact side broadcasts and every join shuffles);
- "bucketed":   the same shape over the bucketed catalog, broadcast still
  disabled (the 100 TB plan WITH the layout — join exchanges gone).

The build cost of the catalog is reported separately ("build_sec"): it is
the once-per-ingest price the per-query savings amortize.

Usage: python scripts/bench_bucketed.py [--sf-dir /root/testdata/sf0.1]
       [--repeat 3] [--buckets 32] [--out /root/repo/BENCH_BUCKETED.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapreduce_paper_implementation_spark.operators.caching import (  # noqa: E402
    release_persisted,
)
from mapreduce_paper_implementation_spark.session import get_spark  # noqa: E402


def _time(fn, repeat: int) -> float:
    best = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_BUCKETED.json"))
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the plan names (e.g. "
        "q84_funnel,q88_event_transitions) — for the scale tiers where "
        "only the behavioral family is affordable",
    )
    ap.add_argument(
        "--merge-key",
        default=None,
        help="instead of overwriting --out, MERGE this run under the given "
        "top-level key of the standing artifact (e.g. x100 for the "
        "scale_data/sf10 tier) — the x10/x100 tier convention",
    )
    args = ap.parse_args()
    if args.queries and not args.merge_key:
        # fail BEFORE the (possibly hour-long) benchmark loop, not at output
        # time (ADVICE r10) — a subset run without a merge key would
        # overwrite the standing full-query artifact
        ap.error("--queries without --merge-key would overwrite the "
                 "standing full-query artifact with a subset")

    from mapreduce_paper_implementation_spark.plans.bucketed_catalog import (
        build_catalog,
        q10_bucketed,
        q11_bucketed,
        q84_bucketed,
        q88_bucketed,
        q98_bucketed,
        q101_bucketed,
    )
    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        behavioral_events_frame,
        click_attribution_shape,
        event_transitions_shape,
        funnel_shape,
        plant_new_snapshot,
        q84_funnel,
        q88_event_transitions,
        q98_snapshot_diff,
        q101_click_attribution,
        snapshot_diff_readout,
    )
    from mapreduce_paper_implementation_spark.plans.queries import (
        orders_by_segment_shape,
        q10_orders_by_segment,
        q11_regional_revenue,
        regional_revenue_shape,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    spark = get_spark("bench_bucketed")
    sf = args.sf_dir
    spark.read.parquet(os.path.join(sf, "region.parquet")).limit(1).write.format(
        "noop"
    ).mode("overwrite").save()

    t0 = time.perf_counter()
    build_catalog(spark, sf, n_buckets=args.buckets, force=True)
    build_sec = round(time.perf_counter() - t0, 3)

    def shuffle_q10():
        return orders_by_segment_shape(
            load_table(spark, sf, "orders"), load_table(spark, sf, "customer")
        )

    def shuffle_q11():
        return regional_revenue_shape(
            load_table(spark, sf, "customer"),
            load_table(spark, sf, "orders"),
            load_table(spark, sf, "lineitem"),
            load_table(spark, sf, "nation"),
            load_table(spark, sf, "region"),
        )

    def shuffle_q98():
        cust = load_table(spark, sf, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
        return snapshot_diff_readout(cust, plant_new_snapshot(cust))

    plans = {
        "q10_orders_by_segment": {
            "registered": lambda: q10_orders_by_segment(spark, sf),
            "shuffle": shuffle_q10,
            "bucketed": lambda: q10_bucketed(spark),
        },
        "q11_regional_revenue": {
            "registered": lambda: q11_regional_revenue(spark, sf),
            "shuffle": shuffle_q11,
            "bucketed": lambda: q11_bucketed(spark, sf),
        },
        "q98_snapshot_diff": {
            "registered": lambda: q98_snapshot_diff(spark, sf),
            "shuffle": shuffle_q98,
            "bucketed": lambda: q98_bucketed(spark),
        },
        # the behavioral family (VERDICT r08 ask #3): per-user window /
        # self-join queries whose only big shuffle is user_id — gone
        # against events_bck. "shuffle" == "registered" shape here (no
        # broadcastable side exists; the windows shuffle regardless).
        "q84_funnel": {
            "registered": lambda: q84_funnel(spark, sf),
            "shuffle": lambda: funnel_shape(
                behavioral_events_frame(load_table(spark, sf, "events"))
            ),
            "bucketed": lambda: q84_bucketed(spark),
        },
        "q88_event_transitions": {
            "registered": lambda: q88_event_transitions(spark, sf),
            "shuffle": lambda: event_transitions_shape(
                behavioral_events_frame(load_table(spark, sf, "events"))
            ),
            "bucketed": lambda: q88_bucketed(spark),
        },
        "q101_click_attribution": {
            "registered": lambda: q101_click_attribution(spark, sf),
            "shuffle": lambda: click_attribution_shape(
                behavioral_events_frame(load_table(spark, sf, "events"))
            ),
            "bucketed": lambda: q101_bucketed(spark),
        },
    }

    if args.queries:
        keep = set(args.queries.split(","))
        unknown = keep - set(plans)
        if unknown:
            ap.error(f"unknown --queries: {sorted(unknown)}")
        plans = {k: v for k, v in plans.items() if k in keep}

    out: dict[str, dict] = {}
    for name, variants in plans.items():
        row: dict[str, float] = {}
        for variant, thunk in variants.items():
            if variant in ("shuffle", "bucketed"):
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                row[variant] = _time(thunk, args.repeat)
            finally:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            release_persisted()
            spark.catalog.clearCache()
        row["bucketed_vs_shuffle"] = round(row["bucketed"] / row["shuffle"], 3)
        out[name] = row

    result = {
        "metric": "bucketed_catalog_wall_clock",
        "unit": "sec",
        "sf_dir": sf,
        "n_buckets": args.buckets,
        "repeat": args.repeat,
        "build_sec": build_sec,
        "queries": out,
    }
    if args.merge_key:
        try:
            with open(args.out) as f:
                standing = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            standing = {}
        standing[args.merge_key] = result
        with open(args.out, "w") as f:
            json.dump(standing, f, indent=1)
        print(json.dumps({args.merge_key: result}))
    else:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
