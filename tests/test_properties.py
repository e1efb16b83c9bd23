"""Property-based differential tests (hypothesis): the engine's DataFrame
operators vs independent pure-Python implementations on adversarial inputs —
unicode, separators, empty strings, pipe characters (the reference's shuffle
corruptor, SURVEY.md §4.2.4), duplicate texts.

deadline=None because Spark job latency dwarfs hypothesis's default budget;
examples are kept small (the value is input shape, not volume).
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"
        ),
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^A-Za-z]+", text) if t]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_wordcount_matches_python(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    from pyspark.sql import functions as F

    got = {
        (r["token"], r["cnt"])
        for r in df.select(F.explode(F.split("text", "[^A-Za-z]+")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    want = set(Counter(tok for t in texts for tok in _py_tokens(t)).items())
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_exact_dedup_matches_python(spark, texts):
    from mapreduce_paper_implementation_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        (r["keeper"], r["n_copies"])
        for r in exact_dedup(df, "text", "doc_id").collect()
    }
    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(t, []).append(i)
    want = {(min(ids), len(ids)) for ids in groups.values()}
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 5), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
def test_grouped_sum_matches_python(spark, vals):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(vals, "k int, v double")
    got = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    want: dict[int, float] = {}
    for k, v in vals:
        want[k] = want.get(k, 0.0) + v
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6 * max(1.0, abs(want[k]))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.floats(-1000, 1000, allow_nan=False), min_size=1, max_size=60),
    n_parts=st.integers(1, 6),
)
def test_global_rank_matches_python(spark, vals, n_parts):
    """The two-pass range-partition global rank must equal the single-node
    sort rank for ANY partition count — including n_parts > n_rows (empty
    range partitions must contribute zero offset, not break the prefix sum)."""
    from pyspark.sql import functions as F

    from mapreduce_paper_implementation_spark.operators.sort import global_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    ranked = global_rank(
        df, [F.col("v").desc(), F.col("id").asc()], rank_col="rnk", n_partitions=n_parts
    )
    got = {(r["id"], r["rnk"]) for r in ranked.collect()}
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    want = {(rid, i + 1) for i, (rid, _) in enumerate(order)}
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=20),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=0, max_size=20),
)
def test_asof_cogrouped_matches_window_path(spark, left, right):
    """The cogrouped-pandas as-of join and the JVM window as-of join must
    agree row-for-row. Right timestamps are de-duplicated per key first:
    BOTH implementations leave the equal-right-ts winner unspecified, so a
    differential test must not depend on it."""
    import datetime

    from mapreduce_paper_implementation_spark.operators.asof import asof_join
    from mapreduce_paper_implementation_spark.operators.cogroup import asof_join_cogrouped

    def ts(s):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)

    seen: set[tuple[int, int]] = set()
    rrows = []
    for i, (k, s) in enumerate(right):
        if (k, s) not in seen:
            seen.add((k, s))
            rrows.append((k, ts(s), float(i)))
    lrows = [(i, k, ts(s)) for i, (k, s) in enumerate(left)]
    ldf = spark.createDataFrame(lrows, "event_id long, user_id int, ts timestamp")
    rdf = spark.createDataFrame(rrows, "user_id int, ts timestamp, value double")
    a = {
        (r["event_id"], r["value_asof"])
        for r in asof_join(ldf, rdf, on="user_id", value_cols=["value"]).collect()
    }
    b = {
        (r["event_id"], r["value_asof"])
        for r in asof_join_cogrouped(ldf, rdf, on="user_id", value_cols=["value"]).collect()
    }
    assert a == b


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 3)), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_null_key_groupby_and_join_semantics(spark, vals):
    """NULL grouping keys form their own group (SQL GROUP BY semantics) but
    never match in equi-joins — the two behaviors a string-typed engine like
    the reference can't even express, pinned here against pure Python."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(vals, "k int, v int")
    got_groups = {
        (r["k"], r["s"]) for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    want: dict[int | None, int] = {}
    for k, v in vals:
        want[k] = want.get(k, 0) + v
    assert got_groups == set(want.items())

    # self equi-join on k: null keys must produce no matches
    j = df.alias("a").join(df.alias("b"), F.col("a.k") == F.col("b.k"))
    got_join = j.count()
    from collections import Counter

    counts = Counter(k for k, _ in vals if k is not None)
    assert got_join == sum(c * c for c in counts.values())


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    tcs=st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=40),
    cap=st.integers(min_value=1, max_value=600),
)
def test_pack_sequences_greedy_invariants(spark, tcs, cap):
    """Greedy packing vs a pure-Python reference on adversarial lengths:
    bins are contiguous in doc order, every bin respects the cap unless it
    holds a single over-cap doc, and bin ids match the reference recurrence."""
    from pyspark.sql import functions as F

    rows = [("s", i, tc) for i, tc in enumerate(tcs)]
    docs = spark.createDataFrame(rows, "source string, doc_id long, tc long")

    # reference recurrence (mirrors the DuckDB oracle CTE)
    want, bin_id, acc = [], 0, 0
    for tc in tcs:
        if acc > 0 and acc + tc > cap:
            bin_id += 1
            acc = 0
        acc += tc
        want.append(bin_id)

    import pandas as pd

    # cap must be a CAPTURED LOCAL: a module attribute referenced inside the
    # closure resolves against the executor's own import of the module (the
    # shipped zip), not the driver's monkeypatched copy.
    cap_ = cap

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, b, a = [], 0, 0
        for tc in pdf["tc"]:
            if a > 0 and a + tc > cap_:
                b += 1
                a = 0
            a += tc
            bins.append(b)
        pdf["bin_id"] = bins
        return pdf

    got_rows = (
        docs.groupBy("source")
        .applyInPandas(pack, schema="source string, doc_id long, tc long, bin_id long")
        .orderBy("doc_id")
        .collect()
    )

    got = [r["bin_id"] for r in got_rows]
    assert got == want
    # invariant: bin totals respect cap except bins holding one NON-EMPTY
    # doc that itself exceeds the cap (zero-length docs pack for free and
    # never force a split)
    totals = Counter()
    nonempty = Counter()
    for r in got_rows:
        totals[r["bin_id"]] += r["tc"]
        nonempty[r["bin_id"]] += 1 if r["tc"] > 0 else 0
    for b, tot in totals.items():
        assert tot <= cap or nonempty[b] == 1
    # bins are contiguous, starting at 0
    assert sorted(set(got)) == list(range(max(got) + 1)) if got else True


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=200),
)
def test_approx_top_k_counts_are_exact_when_capacity_suffices(spark, keys):
    """With per_partition >= distinct keys, the bounded-memory top-k must
    equal the exact computation on ANY distribution (the capped partials
    lose nothing)."""
    from mapreduce_paper_implementation_spark.operators.sketch import approx_top_k
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(str(k),) for k in keys], "k string")
    exact = sorted(Counter(str(k) for k in keys).items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(r["k"], r["cnt"]) for r in approx_top_k(df, "k", k=5, per_partition=64).collect()]
    assert got == exact


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=1, max_size=60
    ),
    n_splits=st.integers(min_value=2, max_value=4),
)
def test_incremental_merge_matches_full_for_any_partitioning(spark, rows, n_splits):
    """merge_rollups over ANY disjoint partitioning == rollup of the whole —
    the algebraic-aggregate property on adversarial groupings."""
    from mapreduce_paper_implementation_spark.operators.incremental import merge_rollups
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "i long, k long, v long"
    )

    def rollup(d):
        return d.groupBy("k").agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )

    parts = [rollup(df.where(F.col("i") % n_splits == j)) for j in range(n_splits)]
    merged = merge_rollups(parts, keys=["k"], add_cols=["n", "s"], min_cols=["mn"], max_cols=["mx"])
    want = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in rollup(df).collect()}
    got = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in merged.collect()}
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=40
    ),
    divisor=st.sampled_from([1, 60, 900, 3600, 3_600_000_000]),
)
def test_floor_div_matches_python_for_any_ints(spark, vals, divisor):
    """functions/numeric.floor_div == Python // for the FULL int64 range
    (the old subtract-modulus form was double-rounded past 2^53 and
    ANSI-overflowed near long-min), any positive divisor."""
    from mapreduce_paper_implementation_spark.functions.numeric import floor_div
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v long")
    got = {
        r["i"]: r["q"]
        for r in df.select("i", floor_div(F.col("v"), divisor).alias("q")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == v // divisor, (v, divisor, got[i], v // divisor)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    micros=st.lists(
        # 1901..2261 in epoch-micros: the span parquet NANOS can carry in
        # an int64, i.e. every instant both encodings can represent
        st.integers(min_value=-2_177_452_800_000_000, max_value=9_214_646_400_000_000),
        min_size=1,
        max_size=25,
    )
)
def test_ts_encodings_load_identically_for_any_instants(spark, tmp_path_factory, micros):
    """Property form of the round-4 encoding fix: ANY instants written as
    TIMESTAMP(MICROS) and as TIMESTAMP(NANOS) load to identical values
    through the catalog."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_paper_implementation_spark.sources.tables import load_table

    tmp = tmp_path_factory.mktemp("enc")
    n = len(micros)
    for enc, arr in (
        ("micros", pa.array(micros, pa.timestamp("us"))),
        ("nanos", pa.array([v * 1000 for v in micros], pa.timestamp("ns"))),
    ):
        d = tmp / enc
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(n), pa.int64()),
                    "ts": arr,
                    "user_id": pa.array([1] * n, pa.int64()),
                    "event_type": pa.array(["e"] * n, pa.string()),
                    "value": pa.array([0.0] * n, pa.float64()),
                    "props": pa.array(["{}"] * n, pa.string()),
                }
            ),
            str(d / "events.parquet"),
            version="2.6",
        )
    a = load_table(spark, str(tmp / "micros"), "events").select("event_id", "ts")
    b = load_table(spark, str(tmp / "nanos"), "events").select("event_id", "ts")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    hist=st.lists(st.integers(0, 200), min_size=0, max_size=30),
    delta=st.lists(st.integers(0, 200), min_size=1, max_size=30),
)
def test_seen_membership_matches_python_sets(spark, hist, delta):
    """Bloom-gated membership == plain set membership for ANY key sets
    (exercises empty history, full-overlap, duplicate keys)."""
    from mapreduce_paper_implementation_spark.operators.membership import seen_membership

    h = spark.createDataFrame([(k,) for k in hist] or [(None,)], "k long").where(
        "k IS NOT NULL"
    )
    d = spark.createDataFrame(
        [(i, k) for i, k in enumerate(delta)], "row_id long, k long"
    )
    got = {
        r["row_id"]: r["seen"]
        for r in seen_membership(d, h, ["k"], num_bits=1 << 10).collect()
    }
    want = {i: (k in set(hist)) for i, k in enumerate(delta)}
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(st.integers(0, (1 << 21) - 1), st.integers(0, (1 << 21) - 1)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_morton_key_is_injective_on_masked_domain(spark, pts):
    """Distinct in-budget (x, y) points map to distinct Morton keys (the
    bijection that makes Z-order a total order over the grid)."""
    from mapreduce_paper_implementation_spark.operators.layout import morton_key

    df = spark.createDataFrame(pts, "x long, y long")
    keys = [r["z"] for r in df.select(morton_key(["x", "y"], 21).alias("z")).collect()]
    assert len(set(keys)) == len(pts)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=25,
    ),
    iters=st.integers(1, 4),
)
def test_pagerank_matches_python_for_any_graph(spark, edges, iters):
    """Scaled-integer PageRank == a pure-Python replay of the recurrence for
    arbitrary small graphs (self-loops, dangling nodes, parallel edges)."""
    from mapreduce_paper_implementation_spark.operators.graph import pagerank
    from tests.test_membership import _py_pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, iters=iters, scale=10**6).collect()
    }
    assert got == _py_pagerank(edges, iters=iters)


# ---------------------------------------------------------------------------
# Segment-monoid maintainers: for ANY time-ordered batch split, folding the
# batches must equal the one-shot batch computation. Hypothesis drives the
# split boundaries (including empty batches and degenerate single-batch
# splits) against a pure-Python replay of the transition semantics.
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(cuts=st.lists(st.integers(min_value=1, max_value=59), max_size=3, unique=True))
def test_transition_maintainer_any_split_matches_python(spark, tmp_path_factory, cuts):
    """60 synthetic events, 4 users, split at arbitrary timeline cuts (empty
    batches allowed): maintained matrix == pure-Python per-user bigram count."""
    import itertools

    from pyspark.sql import functions as F

    from mapreduce_paper_implementation_spark.streaming.transitions import (
        TransitionMaintainer,
    )

    types = ["view", "click", "purchase", "error"]
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", i % 4, types[(i * 7 + i // 4) % 4], 0.0, "{}")
        for i in range(60)
    ]
    events = (
        spark.createDataFrame(
            rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
        )
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    bounds = sorted(cuts) + [60]
    m = TransitionMaintainer(
        spark, str(tmp_path_factory.mktemp("trans_prop"))
    )
    lo = 0
    for bid, hi in enumerate(bounds):
        m.update(
            events.where((F.col("event_id") >= lo) & (F.col("event_id") < hi)), bid
        )
        lo = hi
    got = {
        (r["event_type"], r["next_type"]): r["n_transitions"]
        for r in (m.transitions() or events.limit(0)).collect()
    }
    # pure-Python truth: per-user timeline bigrams
    per_user: dict[int, list[str]] = {}
    for i in range(60):
        per_user.setdefault(i % 4, []).append(types[(i * 7 + i // 4) % 4])
    want: dict[tuple[str, str], int] = {}
    for seq in per_user.values():
        for a, b in itertools.pairwise(seq):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# bfs_hops vs pure-Python BFS on arbitrary small digraphs: hop minimality,
# bound truncation, multi-seed min, cycle termination, self-loops.
# ---------------------------------------------------------------------------


def _py_bfs(edges: list[tuple[int, int]], seeds: list[int], max_hops: int):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=25
    ),
    seeds=st.lists(st.integers(0, 9), min_size=1, max_size=3, unique=True),
    max_hops=st.integers(1, 4),
)
def test_bfs_hops_matches_python(spark, edges, seeds, max_hops):
    from mapreduce_paper_implementation_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(edges or [(99, 99)], "src long, dst long")
    if not edges:
        e = e.where("src < 0")  # genuinely empty edge set, schema intact
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(e, s, max_hops=max_hops).collect()
    }
    assert got == _py_bfs(edges, seeds, max_hops)


def test_bfs_hops_long_chain_bound_vs_exhaustion(spark):
    """Planted 12-edge chain 0->1->...->12 from seed 0: with max_hops=5 the
    HOP BOUND terminates (frontier still alive — exactly nodes 0..5 with
    hop=index), while max_hops=None runs to frontier exhaustion and labels
    the full chain in diameter+1 rounds."""
    from mapreduce_paper_implementation_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    s = spark.createDataFrame([(0,)], "node long")
    bounded = {
        r["node"]: r["hop"] for r in bfs_hops(e, s, max_hops=5).collect()
    }
    assert bounded == {i: i for i in range(6)}
    full = {r["node"]: r["hop"] for r in bfs_hops(e, s).collect()}
    assert full == {i: i for i in range(13)}


# ---------------------------------------------------------------------------
# tile_assign_via_hist vs pure-Python cutpoint replay on arbitrary small
# distributions: the cutpoint rule (exact NTILE boundary ranks on the
# cumulative histogram) and the bin-comparison assignment must match an
# independent in-process implementation bit-for-bit — including ties, hot
# bins spanning several boundaries, negative values, and tiny groups.
# ---------------------------------------------------------------------------


def _py_tiles(values: list[float], n_tiles: int, inv_width: int) -> dict[int, int]:
    import math
    from collections import Counter

    bins = sorted(Counter(math.floor(v * inv_width) for v in values).items())
    n = len(values)
    cuts = []
    for k in range(1, n_tiles):
        t = k * (n // n_tiles) + min(k, n % n_tiles)
        cum = 0
        for b, c in bins:
            cum += c
            if cum >= t:
                cuts.append(b)
                break
    return {
        b: 1 + sum(1 for cb in cuts if cb < b) for b, _ in bins
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(
        st.floats(-5, 5, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=60,
    ),
    n_tiles=st.integers(2, 10),
)
def test_tile_assign_matches_python_cutpoints(spark, values, n_tiles):
    from mapreduce_paper_implementation_spark.operators.incremental import (
        tile_assign_via_hist,
    )

    inv_width = 4
    df = spark.createDataFrame(
        [("g", float(v)) for v in values], "grp string, value double"
    )
    got = {
        r["value"]: r["tile"]
        for r in tile_assign_via_hist(
            df, ["grp"], "value", n_tiles=n_tiles, inv_width=inv_width
        ).collect()
    }
    import math

    want_by_bin = _py_tiles([float(v) for v in values], n_tiles, inv_width)
    for v, tile in got.items():
        assert tile == want_by_bin[math.floor(v * inv_width)], (v, tile)


def test_rolling_p95_readout_matches_python_selection(spark):
    """rolling_p95_readout vs an in-process replay of the identical
    selection rule (t = ceil(0.95 n), min cent with cum >= t) over a
    planted multi-day corpus with ties and gaps."""
    import math

    from pyspark.sql import functions as F

    from mapreduce_paper_implementation_spark.operators.serving import (
        day_cent_hist,
        rolling_p95_readout,
    )

    rows = []
    data: dict[int, list[int]] = {}
    # deterministic synthetic: days 0..9 skipping 4; value cents vary per day
    for day in [0, 1, 2, 3, 5, 6, 7, 8, 9]:
        cents = [((day * 13 + i * 7) % 50) + 1 for i in range(20 + day)]
        data[day] = cents
        rows += [(day * 86_400_000_000, c / 100.0) for c in cents]
    df = spark.createDataFrame(rows, "us long, value double").select(
        F.timestamp_micros("us").alias("ts"), "value"
    )
    got = {
        r["day_num"]: (r["n_events_7d"], r["p95"])
        for r in rolling_p95_readout(day_cent_hist(df)).collect()
    }
    want = {}
    for d in range(0, 10):
        window = [c for day in range(d - 6, d + 1) for c in data.get(day, [])]
        if not window:
            continue
        n = len(window)
        t = math.ceil(0.95 * n)
        cum, p95 = 0, None
        for c in sorted(set(window)):
            cum += window.count(c)
            if cum >= t:
                p95 = c / 100.0
                break
        want[d] = (n, p95)
    assert got == want


# ---------------------------------------------------------------------------
# bm25_readout vs pure-Python Okapi replay on arbitrary small corpora: the
# corpus-derived query-term pick (total order by (df DESC, term), ranks
# 10-14 — including df TIES straddling the rank boundary and vocabularies
# smaller than 14 terms, where the query set is empty and so is the
# result), dl/avgdl/idf arithmetic, ROUND(,4) and the (score DESC, doc_id)
# tiebreak must all match an independent in-process implementation.
# Documents with no tokens never enter the postings frame, so both sides
# exclude them from N/avgdl by construction — the replay models postings,
# not raw text, to pin exactly bm25_readout's contract.
# ---------------------------------------------------------------------------

_BM25_TERMS = [f"w{i:02d}" for i in range(18)]


def _py_bm25(postings, k1=1.2, b=0.75, top=10):
    import math

    dl: dict[int, int] = {}
    dfreq: Counter = Counter()
    for d, t, tf in postings:
        dl[d] = dl.get(d, 0) + tf
        dfreq[t] += 1
    if not dl:
        return []
    avgdl = sum(dl.values()) / len(dl)
    n_docs = len(dl)
    order = sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))
    qterms = dict(order[9:14])
    scores: dict[int, float] = {}
    for d, t, tf in sorted(postings):
        if t not in qterms:
            continue
        dfv = qterms[t]
        idf = math.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
        contrib = idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * (dl[d] / avgdl))
        )
        scores[d] = scores.get(d, 0.0) + contrib
    ranked = sorted(((round(s, 4), d) for d, s in scores.items()),
                    key=lambda x: (-x[0], x[1]))
    return [(d, s) for s, d in ranked[:top]]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    corpus=st.dictionaries(
        keys=st.integers(0, 9),
        values=st.dictionaries(
            keys=st.sampled_from(_BM25_TERMS),
            values=st.integers(1, 4),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_bm25_readout_matches_python(spark, corpus):
    from mapreduce_paper_implementation_spark.operators.serving import bm25_readout

    postings = [
        (doc_id, term, tf)
        for doc_id, terms in corpus.items()
        for term, tf in terms.items()
    ]
    df = spark.createDataFrame(postings, "doc_id long, term string, tf long")
    got = [(r["doc_id"], r["score"]) for r in bm25_readout(df).collect()]
    assert got == _py_bm25(postings)


# ---------------------------------------------------------------------------
# weighted_sample_shape vs pure-Python Efraimidis-Spirakis replay: the
# histogram-cutoff top-k (cut bin from the descending cumsum, strict-above
# pass-through, boundary bin filled by doc_id) must equal rank-by-
# (key DESC, doc_id) take-k for arbitrary small corpora — including
# sources smaller than k (keep all), 6dp key COLLISIONS straddling the
# boundary (forced by tiny weight domains), and k exactly at a bin edge.
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 3)),  # (source, n_chars)
        min_size=1,
        max_size=30,
    ),
    k=st.integers(1, 8),
)
def test_weighted_sample_matches_python(spark, docs, k):
    import math

    from mapreduce_paper_implementation_spark.plans.curation_queries import (
        weighted_sample_shape,
    )

    # ids include NEGATIVES (offset by -5): the fold must keep u positive
    rows = [(i - 5, f"s{s}", n) for i, (s, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = sorted(
        (r["source"], r["doc_id"], r["samp_key"])
        for r in weighted_sample_shape(df, k=k).collect()
    )
    def key(doc_id, n_chars):
        r = doc_id % 2147483648 if doc_id >= 0 else -((-doc_id) % 2147483648)
        m = (r * 2654435761) % 1000000007 if r >= 0 else -((-r * 2654435761) % 1000000007)
        u = ((m + 1000000007) % 1000000007 + 1) / 1000000008.0
        return round(math.exp(math.log(u) / (n_chars + 1)), 6)

    want = []
    for s in {f"s{s}" for s, _ in docs}:
        ranked = sorted(
            (
                (key(i - 5, n), i - 5)
                for i, (src, n) in enumerate(docs)
                if f"s{src}" == s
            ),
            key=lambda t: (-t[0], t[1]),
        )
        want += [(s, i, kk) for kk, i in ranked[:k]]
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# postings_replace_maintainer vs a pure-Python replay over ARBITRARY
# version interleavings: any sequence of batches of (doc_id, crawl_ver)
# pairs — re-crawls, out-of-order old versions, duplicates within a batch,
# token-less versions (tombstones) — must leave the state holding exactly
# the postings of each doc's max-version text, with a tombstone row for
# max-version texts that have no tokens. Text is a PURE FUNCTION of
# (doc_id, ver) — the maintainer's contract requires (doc, ver) to
# determine content uniquely (a pipeline that labels two different crawls
# with one version is feeding corrupt data).
# ---------------------------------------------------------------------------


def _pr_text(doc_id: int, ver: int) -> str:
    # letters only: the engine tokenizer splits on [^A-Za-z]+, so digits
    # inside a synthetic token would fragment it
    if (doc_id + ver) % 4 == 0:
        return "   "  # token-less version: must tombstone, not resurrect
    return " ".join(f"w{'abcd'[doc_id]}{'xyz'[j]}" for j in range(ver + 1))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 2)),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_postings_replace_matches_python_replay(spark, batches, tmp_path_factory):
    from pyspark.sql import functions as F

    from mapreduce_paper_implementation_spark.streaming.rollup import (
        postings_replace_maintainer,
    )

    tmp = tmp_path_factory.mktemp("pr_prop")
    m = postings_replace_maintainer(spark, str(tmp))
    current: dict[int, int] = {}
    for bid, batch in enumerate(batches):
        rows = [(d, _pr_text(d, v), v) for d, v in batch]
        df = spark.createDataFrame(rows, "doc_id long, text string, crawl_ver long")
        m.update(df, bid)
        for d, v in batch:
            current[d] = max(current.get(d, -1), v)
    got = {
        (r["doc_id"], r["term"], r["tf"], r["ver"])
        for r in m.current_state().collect()
    }
    want = set()
    for d, v in current.items():
        toks = [t for t in _pr_text(d, v).split() if t]
        if not toks:
            want.add((d, None, 0, v))
        else:
            for t in set(toks):
                want.add((d, t, toks.count(t), v))
    assert got == want


def _py_bpe(words: list[str], n_merges: int):
    """Pure-Python BPE (Sennrich §3.2): pair counts over word TYPES weighted
    by frequency (all adjacent positions, overlaps included), winner =
    (count DESC, left ASC, right ASC), greedy left-to-right non-overlapping
    merge. Independent of the engine's wrapped-string representation."""
    freq = Counter(words)
    vocab = {w: [c for c in w] for w in freq}
    merges = []
    for rnd in range(1, n_merges + 1):
        pc = Counter()
        for w, sym in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += freq[w]
        if not pc:
            break
        (x, y), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rnd, x, y, c))
        for w, sym in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == x and sym[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    # small alphabet forces pair-count collisions, tie-breaks, and x==y
    # overlap chains ("aaa"); repeated words exercise the freq weighting
    words=st.lists(
        st.text(alphabet="abAB", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    n_merges=st.integers(min_value=1, max_value=5),
)
def test_bpe_train_matches_python(spark, words, n_merges):
    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        bpe_segment,
        bpe_train,
    )

    # one doc per word occurrence: the operator's own word count supplies freq
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = [
        (r["rnd"], r["left_sym"], r["right_sym"], r["pair_cnt"])
        for r in bpe_train(docs, n_merges=n_merges).collect()
    ]
    want_merges, want_vocab = _py_bpe(words, n_merges)
    assert got == want_merges
    # apply/train agreement: segmenting the trained words with the learned
    # table reproduces the trainer's final symbol sequences
    seg = bpe_segment(
        spark.createDataFrame([(w,) for w in set(words)], "w string"),
        [(x, y) for _, x, y, _ in want_merges],
    )
    got_seg = {r["w"]: list(r["subwords"]) for r in seg.collect()}
    assert got_seg == want_vocab


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    # (source, word) occurrences: per-source corpora over a tiny alphabet so
    # sources share subwords and the stats exercise cross-source weighting
    occs=st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki"]),
            st.text(alphabet="abAB", min_size=1, max_size=6),
        ),
        min_size=1,
        max_size=16,
    ),
    n_merges=st.integers(min_value=1, max_value=5),
)
def test_bpe_apply_corpus_stats_matches_python(spark, occs, n_merges):
    """q119's corpus-level train->apply stats vs a pure-Python replay:
    train on the GLOBAL word counts, segment every (source, word) type
    under the learned table, and check n_words / n_subwords / fertility /
    distinct-subword inventory / top-subword ranking per source."""
    from collections import Counter

    from pyspark.sql import functions as F

    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        bpe_apply_merges,
        bpe_merges_from_wordfreq,
    )

    words = [w for _, w in occs]
    want_merges, want_vocab = _py_bpe(words, n_merges)

    swc_rows = Counter(occs)
    swc = spark.createDataFrame(
        [(s, w, c) for (s, w), c in swc_rows.items()],
        "source string, w string, freq long",
    )
    wc = swc.groupBy("w").agg(F.sum("freq").alias("freq"))
    merges = bpe_merges_from_wordfreq(wc, n_merges)
    got_merges = [
        (r["rnd"], r["left_sym"], r["right_sym"], r["pair_cnt"])
        for r in merges.collect()
    ]
    assert got_merges == want_merges

    seg = bpe_apply_merges(swc, merges, word_col="w")
    got = {
        (r["source"], r["w"]): list(r["subwords"]) for r in seg.collect()
    }
    # apply under the learned table == the trainer's final segmentation
    for (s, w), sub in got.items():
        assert sub == want_vocab[w], (s, w, sub, want_vocab[w])

    # per-source corpus stats (the q119 output shape) vs the Python replay
    py_stats: dict[str, dict] = {}
    for (s, w), c in swc_rows.items():
        st_ = py_stats.setdefault(s, {"nw": 0, "nsw": 0, "sub": Counter()})
        st_["nw"] += c
        st_["nsw"] += c * len(want_vocab[w])
        for t in want_vocab[w]:
            st_["sub"][t] += c
    wstats = seg.groupBy("source").agg(
        F.sum("freq").cast("long").alias("n_words"),
        F.sum(F.col("freq") * F.size("subwords")).cast("long").alias("n_subwords"),
    )
    for r in wstats.collect():
        assert r["n_words"] == py_stats[r["source"]]["nw"]
        assert r["n_subwords"] == py_stats[r["source"]]["nsw"]
    persub = (
        seg.select("source", F.explode("subwords").alias("t"), "freq")
        .groupBy("source", "t")
        .agg(F.sum("freq").cast("long").alias("n"))
    )
    got_sub: dict[str, Counter] = {}
    for r in persub.collect():
        got_sub.setdefault(r["source"], Counter())[r["t"]] = r["n"]
    for s, st_ in py_stats.items():
        assert got_sub[s] == st_["sub"]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
        ),
        min_size=1,
        max_size=400,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=400), max_size=4),
    k=st.sampled_from([8, 16, 64]),
)
def test_quantile_sketch_merge_property(data, cuts, k):
    """The VERDICT r10 merge-property replay for the rank sketch, pure
    Python (no Spark): split the stream at arbitrary cut points, sketch
    each part, merge — (a) total weight is EXACTLY n regardless of split
    (mass is never lost or invented), (b) every quantile estimate's exact
    rank is within the deterministic compactor envelope (~2·L·n/k for L
    levels), for BOTH merge directions (associativity within bounds)."""
    import math

    from mapreduce_paper_implementation_spark.operators.sketch import _QSketch

    n = len(data)
    bounds = sorted({min(c, n) for c in cuts} | {0, n})
    parts = [data[a:b] for a, b in zip(bounds, bounds[1:]) if b > a] or [data]

    def build(order):
        sk = _QSketch(k)
        for p in order:
            part = _QSketch(k)
            part.update_many(p)
            sk.merge(part)
        return sk

    s = sorted(data)
    for sk in (build(parts), build(list(reversed(parts)))):
        assert sk.total_weight() == n
        levels = len(sk.levels)
        bound = max(1.0, 2.0 * levels * n / k)
        for phi in (0.01, 0.5, 0.9, 0.99):
            est = sk.quantile(phi)
            rank = sum(1 for v in s if v <= est)
            target = max(1, math.ceil(phi * n))
            assert abs(rank - target) <= bound, (phi, rank, target, bound, k, n)


def _py_unigram(wordfreq: dict[str, int], vocab_size: int, max_len: int, rounds: int, cand_factor: int = 4):
    """Naive single-process replay of operators/tokenizer.py:unigram_train —
    same candidate extraction, same hard-EM (Viterbi) with the identical
    tie-breaks, same prune. Independent of the Spark plumbing (no frames,
    no Arrow): what it checks is that the distributed candidate agg,
    broadcast piece table, and per-round partial/final count aggregation
    compose to the same table."""
    import math

    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        _viterbi_segment,
    )

    cand: dict[str, int] = {}
    for w, f in wordfreq.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                p = w[i : i + l]
                cand[p] = cand.get(p, 0) + f
    top = sorted(cand.items(), key=lambda pc: (-pc[1], pc[0]))[: cand_factor * vocab_size]
    pieces = {p for p, _ in top} | {p for p in cand if len(p) == 1}
    rows = sorted((p, cand[p]) for p in pieces)
    for _ in range(rounds):
        total = sum(c for _, c in rows)
        logp = {p: math.log(c) - math.log(total) for p, c in rows if c > 0}
        floor = min(logp.values(), default=0.0) - math.log(10.0)
        for p, c in rows:
            if c == 0:
                logp[p] = floor
        counted: dict[str, int] = {}
        for w, f in wordfreq.items():
            for piece in _viterbi_segment(w, logp, max_len):
                counted[piece] = counted.get(piece, 0) + f
        rows = [(p, counted.get(p, 0)) for p in sorted(pieces)]
    chars_f = [(p, c) for p, c in rows if len(p) == 1]
    multi = [(p, c) for p, c in rows if len(p) > 1 and c > 0]
    multi.sort(key=lambda pc: (-pc[1], pc[0]))
    keep = chars_f + multi[: max(0, vocab_size - len(chars_f))]
    return sorted(keep)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.lists(
        st.text(alphabet="abAB", min_size=1, max_size=7), min_size=1, max_size=14
    ),
    vocab_size=st.integers(min_value=6, max_value=24),
    rounds=st.integers(min_value=1, max_value=3),
)
def test_unigram_train_matches_python(spark, words, vocab_size, rounds):
    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        unigram_train,
    )

    wf = dict(Counter(words))
    wc = spark.createDataFrame(list(wf.items()), "w string, freq long")
    got = sorted(
        (r["piece"], r["cnt"])
        for r in unigram_train(
            wc, vocab_size=vocab_size, max_len=3, em_rounds=rounds
        ).collect()
    )
    assert got == _py_unigram(wf, vocab_size, 3, rounds)
