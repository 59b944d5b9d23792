"""Gap-based sessionization of event streams.

The webtext half of the graft reads Common-Crawl-style pages, but the
suite's ``events`` table is the classic clickstream shape
(event_id, ts, user_id, ...), and a corpus/analytics engine at web
scale needs the standard session operators over it: assign each event
to a per-user session (a new session starts when the gap since the
user's previous event exceeds a threshold), then aggregate per
session.

Distributed shape: ONE keyed shuffle (window partitioned by user),
then pure column expressions — ``lag`` marks session boundaries, a
running ``sum`` over the boundary flags numbers the sessions.  The
same two-window composition every SQL engine executes; at 10^12
events the shuffle is the unavoidable cost and everything else is
whole-stage codegen.  Zipfian-heavy users (bots) make fat window
partitions — pre-filter with ``functions.web.hot_hosts``'s analogue
(a per-user count) and cap or salt them, exactly like the spatial
layer's hot cells.

For STREAMING sessionization (unbounded input, watermarked state) use
``applyInPandasWithState`` — see streaming/dedup_stream.py for the
state-store pattern; this module is the batch contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_sec: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign each event a per-user ``session_seq`` (1-based, in time
    order).  A new session starts at the user's first event and
    whenever ``ts - prev_ts > gap_sec`` (strictly greater: an event
    exactly at the gap is the SAME session).

    Ties on ts break by event id, so the assignment is deterministic
    under any partitioning.  returns the input columns +
    ``session_seq`` (long).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    # integer MICROSECONDS end to end: no float boundary edge cases,
    # and a session-timezone offset (ntz -> timestamp interpretation)
    # cancels in the difference (DST-free zones; run drivers in UTC)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    gap_us = int(round(gap_sec * 1_000_000))
    new_sess = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), 1
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_seq", F.sum(new_sess).over(running).cast("long")
    )


def session_stats(
    events: DataFrame,
    gap_sec: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregate: (user, session_seq, n_events,
    start_ts, end_ts, duration_sec [, sum_value]).  One more hash
    aggregate on (user, session_seq) — map-side combinable, and it
    reuses the sessionize window's partitioning (same key prefix, so
    Catalyst plans no second full exchange)."""
    s = sessionize(events, gap_sec, user_col, ts_col, id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("duration_sec"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return s.groupBy(user_col, "session_seq").agg(*aggs)
