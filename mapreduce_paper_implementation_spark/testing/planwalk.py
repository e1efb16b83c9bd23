"""Shared physical-plan tree walker (py4j) — ONE implementation for the
plan-audit script and the plan-shape tests, so a wrapper-handling fix
(AQE final plan, query stages, cached relations, expression-held
subqueries, Reused* stops) applies everywhere at once (round-9 review:
tests/test_plans.py had re-grown its own walker minus the subqueries()
traversal plan_audit had just gained).

Semantics: yields every REAL operator node exactly as it executes —
- AdaptiveSparkPlanExec   -> recurse into executedPlan() only (the printed
  "Initial Plan" never executes);
- *QueryStageExec         -> recurse into plan();
- InMemoryTableScanExec   -> recurse into the cached plan ONCE per cached
  relation (keyed by CacheBuilder hash — projections of one persist share
  a builder), because the cached subtree executes once no matter how many
  scans read it;
- ReusedExchangeExec / ReusedSubqueryExec -> stop (the original executes
  elsewhere in the tree and is counted there);
- node.subqueries()       -> traversed after children: physical plans
  hanging off EXPRESSIONS (ScalarSubquery/InSubquery SubqueryExec trees)
  are not in children() and would otherwise be invisible.
"""

from __future__ import annotations

from collections.abc import Iterator


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _subqueries(node) -> list:
    try:
        return _seq(node.subqueries())
    except Exception:
        return []


def iter_plan(node, _cached_seen: set | None = None) -> Iterator:
    """Yield every real operator node under `node` (see module docstring
    for wrapper semantics). Pass nothing for `_cached_seen`; it threads
    the once-per-cached-relation dedupe through the recursion."""
    seen = _cached_seen if _cached_seen is not None else set()
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from iter_plan(node.executedPlan(), seen)
        return
    if name.endswith("QueryStageExec"):
        yield from iter_plan(node.plan(), seen)
        return
    if name == "InMemoryTableScanExec":
        builder_key = node.relation().cacheBuilder().hashCode()
        if builder_key not in seen:
            seen.add(builder_key)
            yield from iter_plan(node.relation().cachedPlan(), seen)
        return
    if name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
        return
    yield node
    for child in _seq(node.children()):
        yield from iter_plan(child, seen)
    for sq in _subqueries(node):
        yield from iter_plan(sq, seen)
