"""Artifact-freshness gate (VERDICT r07 ask #6): every registered query
must have a row in CORRECTNESS_FULL.json AND PLANS.md AND BASELINE.md's
standing per-query table — and no artifact may carry rows for queries that
no longer exist. Catches the r06 q77-staleness class of bug structurally
(a query registered without refreshed artifacts fails HERE, not in the
judge's read).

Refresh recipe when this fails (memory/round-workflow):
    python scripts/driver_sim.py --json CORRECTNESS_FULL.json
    python scripts/plan_audit.py
    python bench.py --queries <new>   # solo, then append BASELINE.md rows
"""

from __future__ import annotations

import json
import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registered() -> set[str]:
    return set(entry.queries())


def _md_query_rows(path: str) -> set[str]:
    with open(path) as f:
        names = set(re.findall(r"^\| (q\d\w+) \|", f.read(), re.M))
    return names


def test_correctness_full_covers_registry_exactly():
    with open(os.path.join(REPO, "CORRECTNESS_FULL.json")) as f:
        recorded = set(json.load(f)["results"])
    registered = _registered()
    assert registered - recorded == set(), (
        f"queries missing from CORRECTNESS_FULL.json: {sorted(registered - recorded)} "
        "— run scripts/driver_sim.py --json CORRECTNESS_FULL.json"
    )
    assert recorded - registered == set(), (
        f"stale CORRECTNESS_FULL.json rows for unregistered queries: "
        f"{sorted(recorded - registered)}"
    )


# Paths whose change invalidates a recorded correctness run: anything that
# defines what a query computes. Docs/bench/artifact-only commits do not.
_QUERY_DEFINING = [
    "mapreduce_paper_implementation_spark",
    "__spark_entry__.py",
]


def test_correctness_full_sha_not_stale():
    """CORRECTNESS_FULL.json records the git SHA it was generated at
    (VERDICT r08 ask #7); the artifact is stale — and this gate fails —
    iff query-defining code changed since that SHA (committed or in the
    working tree). Artifact/doc/bench commits after the run are fine."""
    import subprocess

    with open(os.path.join(REPO, "CORRECTNESS_FULL.json")) as f:
        meta = json.load(f)
    sha = meta.get("git_sha")
    assert sha, (
        "CORRECTNESS_FULL.json records no git_sha — regenerate with "
        "scripts/driver_sim.py --json CORRECTNESS_FULL.json"
    )
    diff = subprocess.run(
        ["git", "-C", REPO, "diff", "--name-only", sha, "--", *_QUERY_DEFINING],
        capture_output=True,
        text=True,
    )
    assert diff.returncode == 0, (
        f"recorded git_sha {sha} not in history: {diff.stderr.strip()}"
    )
    changed = [l for l in diff.stdout.splitlines() if l.strip()]
    assert not changed, (
        f"CORRECTNESS_FULL.json was generated at {sha[:12]} but query-defining "
        f"code changed since: {changed[:10]} — rerun "
        "scripts/driver_sim.py --json CORRECTNESS_FULL.json"
    )


def test_correctness_full_sha_to_head_is_artifact_only():
    """The previous gate scopes its diff to query-DEFINING paths; this one
    closes the remaining honesty gap (VERDICT r09 ask #4): the committed
    history between the recorded sha and HEAD may contain NO source at all
    (*.py / *.sql anywhere — tests, scripts, the package), only
    artifact/doc commits. So "CORRECTNESS_FULL is green at HEAD" always
    means "the code that ran is the code you are reading", not "the query
    layer happened not to change"."""
    import subprocess

    with open(os.path.join(REPO, "CORRECTNESS_FULL.json")) as f:
        sha = json.load(f).get("git_sha")
    assert sha, "CORRECTNESS_FULL.json records no git_sha"
    diff = subprocess.run(
        ["git", "-C", REPO, "diff", "--name-only", f"{sha}..HEAD"],
        capture_output=True,
        text=True,
    )
    assert diff.returncode == 0, (
        f"recorded git_sha {sha} not in history: {diff.stderr.strip()}"
    )
    source = [
        l
        for l in diff.stdout.splitlines()
        if l.strip().endswith((".py", ".sql"))
    ]
    assert not source, (
        f"commits since the recorded CORRECTNESS_FULL sha {sha[:12]} touch "
        f"source files: {source[:10]} — commit code first, then rerun "
        "scripts/driver_sim.py --json CORRECTNESS_FULL.json, then commit "
        "the artifact"
    )


def test_correctness_full_is_green():
    """Freshness alone is not enough — the recorded run must also be green
    (a refreshed artifact full of mismatches must not pass the gate)."""
    with open(os.path.join(REPO, "CORRECTNESS_FULL.json")) as f:
        results = json.load(f)["results"]
    bad = {
        n: r
        for n, r in results.items()
        if r.get("err") is not None
        or (r.get("mode") == "oracle" and r.get("hash_match") is not True)
    }
    assert not bad, f"non-green CORRECTNESS_FULL.json rows: {sorted(bad)}"


def test_plans_md_covers_registry_exactly():
    rows = _md_query_rows(os.path.join(REPO, "PLANS.md"))
    registered = _registered()
    assert registered - rows == set(), (
        f"queries missing from PLANS.md: {sorted(registered - rows)} "
        "— run scripts/plan_audit.py"
    )
    assert rows - registered == set(), (
        f"stale PLANS.md rows: {sorted(rows - registered)}"
    )


def test_baseline_md_table_covers_registry_exactly():
    rows = _md_query_rows(os.path.join(REPO, "BASELINE.md"))
    registered = _registered()
    assert registered - rows == set(), (
        f"queries missing a BASELINE.md standing-table row: "
        f"{sorted(registered - rows)} — run bench.py solo and append"
    )
    assert rows - registered == set(), (
        f"stale BASELINE.md rows: {sorted(rows - registered)}"
    )


# Queries deliberately shipped WITHOUT an oracle (rows-only driver check).
# Adding a name here must be a conscious, documented choice, never a
# forgotten oracle (the r06 staleness class, oracle edition).
# EMPTY since round 12: q121/q123 (the former Viterbi-derived rows-only
# pair) now emit the invariant readout — SQL-exact anchors + pinned-TRUE
# booleans (the q34/q114/q120 est_ok pattern) — so every registered query
# is hash-gated; the trained pieces themselves stay differential-gated by
# the pure-Python EM replay + tests/test_round11_additions.py pins.
ROWS_ONLY_ALLOWED: set[str] = set()


def test_oracle_contract_is_total():
    """Every query has an oracle unless explicitly allowlisted rows-only,
    and no oracle is orphaned — the driver contract's own freshness."""
    qs, os_ = set(entry.queries()), set(entry.oracle_sql())
    assert os_ - qs == set(), f"orphan oracles: {sorted(os_ - qs)}"
    assert qs - os_ == ROWS_ONLY_ALLOWED, (
        f"queries registered without an oracle and not allowlisted: "
        f"{sorted(qs - os_ - ROWS_ONLY_ALLOWED)}"
    )
