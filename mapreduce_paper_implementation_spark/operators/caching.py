"""Scoped persist registry — explicit cache lifecycle for operator
intermediates.

Dedup/similarity operators persist small intermediate frames (shingle
frames, band indexes, fingerprints) because their plans consume them from
multiple branches and Spark does not reuse the exchange across branches.
Those persists used to rely on LRU eviction for cleanup, which is fine for
one bench run (caches cleared between queries) but lets a long-running
session accumulate cached frames until memory pressure evicts them.

`scoped_persist` registers every persisted frame in a process-wide list;
`release_persisted()` unpersists them all. Unpersisting is ALWAYS safe:
a still-unevaluated plan that references a released frame simply recomputes
it. Call sites:

- bench.py / scripts/driver_sim.py call release_persisted() after each
  query, so a full-manifest run caches at most one query's intermediates at a
  time.
- Long-running sessions call it whenever a dedup/ANN result has been fully
  consumed.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist(MEMORY_AND_DISK) + register for later release_persisted().

    CONTRACT: callers that run many queries in one session (bench.py,
    driver_sim, the test conftest) call release_persisted() between
    queries — operators persist freely under that discipline. A long-lived
    consumer that never releases accumulates one (typically small,
    histogram-sized) cache entry per operator call; call
    release_persisted() at your own query boundaries."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    return df


@contextlib.contextmanager
def persist_scope():
    """Release, at scope exit, ONLY the frames scoped_persist registered
    inside the scope — the enforced form of the release_persisted()
    convention (ADVICE r09: library operators persist internally and a
    long-lived serving consumer that never calls release_persisted()
    accumulates registry entries forever).

    Use around any block that MATERIALIZES its result before the scope
    closes (an action, a parquet write): the cache pays off during the
    materialization and is dropped before the caller continues, so the
    global registry cannot grow across requests. A still-lazy frame that
    escapes the scope merely recomputes — correctness never depends on
    the cache. Nests correctly (inner scopes release only their own
    frames); frames the caller registered BEFORE entering are untouched.
    streaming/rollup.py:RollupMaintainer.update wraps each state fold in
    one of these, which is what lets maintainer state_fns persist their
    multi-consumer deltas without leaking across batches.

    SINGLE-THREAD INVARIANT (ADVICE r10): the registry is one global list
    and the scope releases by positional mark, so scoped_persist and
    persist_scope must be called from ONE thread — a scoped_persist from
    another thread landing inside an open scope would be unpersisted by
    the wrong scope at exit. Operators that submit driver threads (e.g.
    pq_train's per-subspace fits) must do all their scoped_persist calls
    from the coordinating thread, never inside the workers — pq_train
    complies. If a future operator genuinely needs per-thread persist
    scopes, make _PERSISTED a threading.local first."""
    mark = len(_PERSISTED)
    try:
        yield
    finally:
        for df in _PERSISTED[mark:]:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass  # session already stopped; nothing to release
        del _PERSISTED[mark:]


def release_persisted() -> int:
    """Unpersist every registered frame; returns how many were released.
    Safe at any time — plans still holding a released frame recompute it."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to release
    _PERSISTED.clear()
    return n
