"""Streaming sessionization — Spark's NATIVE session windows.

The batch operator (operators/sessions.py) numbers each user's events
into ordinal sessions with a window function; on an unbounded stream
the same semantics come from ``F.session_window(ts, gap)``: Spark
merges events into per-key sessions that CLOSE when no event arrives
within the gap, and the watermark bounds state (a session older than
the watermark can never reopen, so its state is evicted and its final
aggregate emitted — append mode).

This is the built-in operator doing exactly what a custom
applyInPandasWithState sessionizer would do, with state eviction and
late-data handling for free — prefer it; the state-store pattern in
dedup_stream.py remains for semantics Spark has no native operator
for (cross-stream exactly-once emission).

Scale notes: state is one (key, open-session) aggregate per active
session — shuffle partitions by user, so Zipfian bot users
concentrate events but still hold ONE open session row each; the gap
closes idle sessions and the watermark hard-bounds total state age.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """events stream -> one row per CLOSED session: (user_id,
    session_start, session_end, n_events [, sum_value]).

    Works identically on a batch DataFrame (session_window is a
    regular grouping expression), which is how the pytest oracle
    checks it against the batch sessionizer.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    out = src.groupBy(
        F.col(user_col), F.session_window(F.col(ts_col), gap)
    ).agg(*aggs)
    return out.select(
        user_col,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        *(["sum_value"] if value_col else []),
    )
