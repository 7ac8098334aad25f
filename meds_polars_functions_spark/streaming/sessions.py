"""Gap-based sessionization over event streams.

Beyond-reference (the reference has no event-time semantics at all,
SURVEY §2.10). Uses Spark's native ``session_window`` — state-backed in
Structured Streaming (sessions merge as late events arrive, finalize at
the watermark), plain agg in batch. The same call works for both, which
is how the batch DuckDB oracle can check the streaming operator's
semantics: a session ends when ``gap`` elapses with no event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Per-key session aggregates: start/end, event count, value sum.

    Scale: sessions shuffle once on (key, session_window); streaming state
    is per open session only. Skewed keys (one user = one partition's
    worth of events) are the known hazard — AQE skew handling plus the
    per-key+window grouping bound the state.
    """
    if events.isStreaming:
        events = events.withWatermark(time_col, watermark_delay)
    win = F.session_window(F.col(time_col), gap)
    return (
        events.groupBy(win.alias("session"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
            F.min(time_col).alias("first_event"),
            F.max(time_col).alias("last_event"),
        )
        .select(
            F.col(key_col),
            F.col("session.start").alias("session_start"),
            F.col("first_event"),
            F.col("last_event"),
            "n_events",
            "value_sum",
        )
    )
