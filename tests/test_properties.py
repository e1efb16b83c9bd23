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
