"""Event-funnel analytics: windowed ordered-step conversion levels.

Beyond-reference operator family (the reference — a MEDS/Polars ETL
library, see e.g. reference src/MEDS_polars_functions/filter_patients.py:1
for its per-patient predicate style — has no behavioral-analytics
surface). Semantics are DEFINITIONAL, not implementation-defined:

    funnel_level(user) = max L such that there EXIST events
        e_1, ..., e_L of that user with event_type(e_i) = steps[i],
        strictly increasing timestamps ts(e_1) < ... < ts(e_L), and
        total span ts(e_L) - ts(e_1) <= window.

(Any other events may be interleaved; the span bound on the LAST element
implies every intermediate element is inside the window too.) This is
the existential form of the funnel popularized by ClickHouse's
``windowFunnel`` — but computed exactly, not via the greedy
approximation, so a plain SQL triple-join oracle can verify it.

100 TB design — the whole computation is JVM-side, no Python UDF:

- The step filter is an ``isin`` on the event-type column applied
  straight to the scan (PushedFilters row-group pruning: only funnel
  step types are ever read).
- The per-user dynamic program runs as k-1 chained window expressions
  over ONE hash partitioning on the user column: let

      P_i(t) = max start-timestamp over chains reaching step i whose
               last event is STRICTLY earlier than t

  computed as ``max(start_i) OVER (PARTITION BY user ORDER BY ts
  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`` — the range
  frame is by VALUE, so the "1 PRECEDING" bound excludes same-timestamp
  rows, which is exactly the strict ``<`` chain constraint (a chain
  never advances on a tied timestamp, matching the SQL oracle's
  ``b.ts > a.ts``). Keeping only the LATEST start per level is optimal:
  chains recorded at strictly earlier rows are all extendable, and a
  later start can only loosen the span bound.
- Catalyst plans the k-1 Window operators over a single
  Exchange+Sort (same partitioning and ordering throughout), and the
  final per-user max reuses the hash partitioning, so the whole operator
  costs ONE shuffle of (user, ts, step) triples — document bodies,
  props, values never move.
- ``funnel_counts`` reduces the per-user levels to a k-row step spine —
  the per-level aggregate is <= k+1 rows, so the spine join is a
  broadcast of literals no matter the corpus size.

Skew: a pathological user with billions of events lands in one
partition, like any per-entity ordered computation; the state per user
is O(k) so a salted two-phase variant (per-salt P_i maxima merged by a
second pass) is mechanical if ever needed — not implemented because the
window frame itself is streaming (Spark evaluates bounded-preceding
range frames incrementally, never materializing the group).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["window_funnel", "funnel_counts", "funnel_events"]


def _ts_us(col: Column, dtype: str) -> Column:
    """Microsecond epoch for the chain arithmetic. Accepts timestamp
    (unix_micros) or an already-numeric epoch column (passed through) so
    callers that pre-resolved the events nanos-as-long ambiguity can
    feed either shape."""
    if dtype == "timestamp_ntz":
        # value-preserving relabel under the pinned UTC session zone
        # (unix_micros rejects TIMESTAMP_NTZ outright)
        col = col.cast("timestamp")
        dtype = "timestamp"
    if dtype == "timestamp":
        return F.unix_micros(col)
    return col.cast("long")


def funnel_events(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Shared JVM front-end for the batch and streaming funnels:
    ``(user_col, __tu:long µs, __step:int 1..k)``, with the step filter
    as a plain ``isin`` (scan-pushable — the when-chain mapping is not)
    and the timestamp normalized to integer microseconds."""
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be non-empty and distinct")
    dtype = dict(events.dtypes).get(ts_col)
    step_idx = F.lit(None).cast("int")
    for i in range(len(steps) - 1, -1, -1):
        step_idx = F.when(F.col(type_col) == steps[i], F.lit(i + 1)).otherwise(
            step_idx
        )
    return events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        _ts_us(F.col(ts_col), dtype).alias("__tu"),
        step_idx.alias("__step"),
    )


def window_funnel(
    events: DataFrame,
    steps: Sequence[str],
    window: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    out_col: str = "funnel_level",
) -> DataFrame:
    """Per-user funnel level: ``(user_col, out_col:int)`` with out_col in
    ``[1, len(steps)]`` — users with no event of any step type emit no
    row; users with step-type events but no ``steps[0]`` event emit 0.

    ``window`` is the maximum chain span in MICROSECONDS (inclusive:
    ``ts(e_L) - ts(e_1) <= window``).
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != k:
        raise ValueError("steps must be distinct event types")
    if window < 0:
        raise ValueError("window must be >= 0 microseconds")

    df = funnel_events(events, steps, user_col, ts_col, type_col)

    # Strict-prefix frame: by-value range, upper bound -1 => only rows with
    # a strictly smaller timestamp contribute (ties can never chain).
    w = (
        Window.partitionBy(user_col)
        .orderBy("__tu")
        .rangeBetween(Window.unboundedPreceding, -1)
    )

    # start_i = chain-start timestamp of a valid chain reaching step i that
    # ends AT this row (null when this row's step can't extend one).
    start = F.when(F.col("__step") == 1, F.col("__tu"))
    df = df.withColumn("__start_1", start)
    for i in range(2, k + 1):
        # Materialize P_{i-1} once: referencing the window expression
        # inline would plan three identical window aggregates per level
        # (one per reference) — one named column keeps it to one.
        df = df.withColumn(f"__p_{i - 1}", F.max(f"__start_{i - 1}").over(w))
        prev = F.col(f"__p_{i - 1}")
        df = df.withColumn(
            f"__start_{i}",
            F.when(
                (F.col("__step") == i)
                & prev.isNotNull()
                & (F.col("__tu") - prev <= F.lit(window)),
                prev,
            ),
        )

    # Each row carries at most one non-null __start_i (its own step), so the
    # per-row reached-level is a simple descending coalesce-to-level.
    reached = F.lit(0)
    for i in range(1, k + 1):
        reached = F.when(F.col(f"__start_{i}").isNotNull(), F.lit(i)).otherwise(
            reached
        )
    return (
        df.withColumn("__reached", reached)
        .groupBy(user_col)
        .agg(F.max("__reached").cast("int").alias(out_col))
    )


def funnel_counts(
    levels: DataFrame,
    steps: Sequence[str],
    level_col: str = "funnel_level",
    user_col: str = "user_id",
) -> DataFrame:
    """Reduce per-user levels to the k-row funnel: ``(step:int,
    step_name:string, users:long)`` where ``users`` counts users whose
    level >= step. Steps nobody reaches still emit a row (users=0).

    The per-level aggregate has <= len(steps)+1 rows; the >= join against
    the literal spine is a broadcast nested loop over two tiny frames —
    nothing here scales with the corpus.
    """
    spark = levels.sparkSession
    from meds_polars_functions_spark.functions.expr import arrow_literal_frame

    # Arrow literal (round 15): JVM LocalTableScan, no pickle worker.
    spine = arrow_literal_frame(
        spark, [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    per_level = levels.groupBy(level_col).agg(
        F.count(user_col).alias("__n")
    )
    return (
        spine.join(
            F.broadcast(per_level),
            per_level[level_col] >= spine["step"],
            "left",
        )
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("users"))
    )
