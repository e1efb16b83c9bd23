"""Sessionization: assign events to sessions by inactivity gap.

Batch formulation (the streaming analog is streaming/sessions.py's
session_window): per user, sort by (ts, event_id), mark a new session when
the gap to the previous event exceeds `gap`, session index = running sum of
marks. One shuffle on user_id; the window sort is partition-local — the
standard lag+cumsum sessionize, linear at any scale, skew bounded by the
busiest single user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_S = 1800


def sessionize(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Returns events + (session_idx) per user: 1-based, increments when the
    gap to the previous event exceeds gap_s (strictly, in microseconds)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > gap_s * 1_000_000), 1).otherwise(0)
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def session_stats(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Per user: event count + number of sessions at the given gap.
    Returns (user_id, n_events, n_sessions) sorted by user_id."""
    s = sessionize(events, gap_s)
    return (
        s.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("session_idx").alias("n_sessions"),
        )
        .orderBy("user_id")
    )
