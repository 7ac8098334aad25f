"""Stream-stream event-time interval join.

Beyond-reference (the reference is batch-only — SURVEY.md §2.10): the
streaming form of ``operators/temporal.range_join``. Both sides carry
event-time watermarks, and the join condition bounds the time gap, so
Spark can (a) buffer only the watermark-deep tail of each side in the
state store and (b) emit exactly-once append-mode results. Without the
time bound, stream-stream state grows without limit — the interval IS
the scale contract.

The same function applied to batch DataFrames executes identically
(``withWatermark`` is a no-op in batch), which is what the
batch-equivalence test pins.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join rows with equal ``on`` keys where ``right_time`` falls
    in ``[left_time + lower_seconds, left_time + upper_seconds]``.

    All non-key column names must be distinct between the two sides
    (rename before calling); the key column is returned once. The
    watermark bounds state retention: rows older than
    ``watermark + upper_seconds`` past the max seen event time are
    evicted from the join state.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    overlap = set(left.columns) & set(right.columns) - {on}
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")
    l = left.withWatermark(left_time, watermark).alias("l")
    r = right.withWatermark(right_time, watermark).alias("r")
    cond = F.expr(
        f"l.{on} = r.{on} "
        f"AND r.{right_time} >= l.{left_time} + INTERVAL {int(lower_seconds)} SECONDS "
        f"AND r.{right_time} <= l.{left_time} + INTERVAL {int(upper_seconds)} SECONDS"
    )
    return l.join(r, cond).drop(F.col(f"r.{on}"))
