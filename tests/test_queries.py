"""Differential tests: every manifest query vs the DuckDB oracle.

Mirrors the reference's correctness scheme — distributed output compared
against a sequential oracle (/root/reference/test-mr.sh:36-66) — with DuckDB
replacing `mrsequential` and hash-style value comparison replacing `cmp`.
"""

from __future__ import annotations

import pytest

from mapreduce_paper_implementation_spark.plans.queries import ORACLES, QUERIES
from mapreduce_paper_implementation_spark.testing.compare import compare_query

ORACLE_BACKED = sorted(n for n in QUERIES if n in ORACLES)
ROWS_ONLY = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    res = compare_query(spark, oracle, name, QUERIES[name], ORACLES[name], sf_dir)
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
