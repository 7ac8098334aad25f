"""Sessionized conversion attribution: first/last-touch channel credit.

Beyond-reference operator family (the reference — a MEDS/Polars ETL
library, see e.g. reference src/MEDS_polars_functions/filter_patients.py:1
for its per-patient predicate style — has no behavioral-analytics
surface). Composes the repo's two established behavioral axes: gap
sessionization (streaming/sessions.py aggregates sessions; here events
need per-EVENT session ids, the classic gaps-and-islands form) and
conversion analytics (operators/funnel.py).

Semantics are DEFINITIONAL, integer-only, so a plain SQL oracle can
replay them exactly:

- Events of a user are ordered by ``(ts, event_id)`` (the id breaks
  timestamp ties deterministically). A new session starts at the first
  event and whenever the gap to the previous event EXCEEDS ``gap``
  microseconds (``ts - prev_ts > gap``; a gap of exactly ``gap`` keeps
  the session — the same merge rule as ``session_window``'s half-open
  ``[ts, ts+gap)`` extent).
- A session CONVERTS if it contains at least one event of the
  conversion type; the FIRST such event (in session order) defines the
  conversion. Later conversions in the same session earn no extra
  credit (one conversion per session — the standard dedup that keeps
  credit counts equal to converting-session counts).
- Touches are the session's events strictly BEFORE the converting
  event (session positions ``1 .. fprn-1``). First-touch credit goes to
  the channel (event type) at position 1, last-touch credit to the
  channel at position ``fprn - 1``. A session whose very first event is
  the conversion has no touches: both credits go to ``(direct)``.

100 TB design — entirely JVM-side, no Python UDF, ONE corpus shuffle:

- The scan reads 4 narrow columns (user, ts, id, type); bodies/props
  never move.
- Session assignment = lag + running sum over ``(user)`` partitioning:
  one hash exchange of ~30-byte rows, two Window operators sharing the
  same Exchange+Sort.
- Every later step keeps that partitioning: the per-session windows
  partition by ``(user, session)`` and the per-session groupBy groups
  by ``(user, session)`` — ``HashPartitioning(user)`` satisfies
  ``ClusteredDistribution(user, session)`` (rows of one session can
  never straddle partitions), so Catalyst inserts sorts but NO further
  corpus exchange (the same reuse mechanism the retention-cohort
  no-join plan is pinned on).
- The final channel totals are two aggregates over one row per
  converting session, keyed by channel — k-row frames; their exchanges
  and the full-outer channel join are negligible at any corpus size.

Skew: a pathological user is one partition's worth of ordered rows, as
in every per-entity computation here; per-row state is O(1) (lag, a
running sum, a row number) and Spark evaluates running frames
incrementally, so there is no per-group materialization to blow up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.funnel import _ts_us

__all__ = [
    "assign_sessions",
    "attribution_events",
    "session_credits",
    "session_paths",
    "touch_attribution",
    "DIRECT_CHANNEL",
]

#: Channel credited when the converting event opens its session (no
#: preceding touch exists).
DIRECT_CHANNEL = "(direct)"


def attribution_events(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Shared JVM front-end for the batch and streaming attribution:
    ``(user_col, __tu:long µs, __eid:long, type_col)`` with the
    timestamp normalized to integer microseconds and the id cast for
    the deterministic ``(__tu, __eid)`` tie order.

    The id column must already be integral (ADVICE r12: a silent
    ``cast("long")`` of a non-numeric id produces NULLs, collapsing the
    tiebreak and making timestamp-tie ordering — and thus touch picks
    and session paths — nondeterministic instead of erroring; the same
    silent-type-assumption class as the r11 ``user_col`` fix). Callers
    with string/uuid event ids must map them to a stable integer (e.g.
    ``xxhash64``) explicitly, choosing their own tie order."""
    from pyspark.sql import types as T

    id_type = events.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise TypeError(
            f"attribution id column {id_col!r} must be an integral type "
            f"for the deterministic (ts, id) tie order; got "
            f"{id_type.simpleString()} — cast it to a stable integer "
            "(e.g. xxhash64) explicitly instead of relying on a silent "
            "cast that would NULL the tiebreak"
        )
    dtype = dict(events.dtypes).get(ts_col)
    return events.select(
        F.col(user_col),
        _ts_us(F.col(ts_col), dtype).alias("__tu"),
        F.col(id_col).cast("long").alias("__eid"),
        F.col(type_col),
    )


def assign_sessions(
    events: DataFrame,
    gap: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-event gap sessionization: ``(user_col, __tu:long µs,
    __eid:long, type_col, __sid:long)`` where ``__sid`` numbers a user's
    sessions 1.. in time order. A new session starts when the gap to the
    user's previous event (by ``(__tu, __eid)`` order) is STRICTLY
    greater than ``gap`` microseconds."""
    if gap < 0:
        raise ValueError("gap must be >= 0 microseconds")
    df = attribution_events(events, user_col, ts_col, id_col, type_col)
    w = Window.partitionBy(user_col).orderBy("__tu", "__eid")
    new_session = (
        F.lag("__tu").over(w).isNull()
        | (F.col("__tu") - F.lag("__tu").over(w) > F.lit(gap))
    ).cast("int")
    return df.withColumn(
        "__sid",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_credits(
    events: DataFrame,
    gap: int,
    conversion: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per CONVERTING session: ``(user_col, __sid:long,
    first_touch:string, last_touch:string)`` — the per-session credit
    frame ``touch_attribution`` aggregates, exposed for callers that
    need session-level attribution (and for the stream≡batch parity
    test of the streaming form)."""
    s = assign_sessions(events, gap, user_col, ts_col, id_col, type_col)

    w_ord = Window.partitionBy(user_col, "__sid").orderBy("__tu", "__eid")
    s = s.withColumn("__rn", F.row_number().over(w_ord))
    # First conversion's session position — a whole-partition window so
    # every row of the session sees it (needed to pick position fprn-1).
    w_sess = Window.partitionBy(user_col, "__sid")
    s = s.withColumn(
        "__fprn",
        F.min(F.when(F.col(type_col) == conversion, F.col("__rn"))).over(w_sess),
    )

    return (
        s.filter(F.col("__fprn").isNotNull())
        .groupBy(user_col, "__sid")
        .agg(
            F.min("__fprn").alias("__fp"),  # constant within the session
            F.max(F.when(F.col("__rn") == 1, F.col(type_col))).alias("__t1"),
            F.max(
                F.when(F.col("__rn") == F.col("__fprn") - 1, F.col(type_col))
            ).alias("__tl"),
        )
        .select(
            F.col(user_col),
            F.col("__sid"),
            F.when(F.col("__fp") == 1, F.lit(DIRECT_CHANNEL))
            .otherwise(F.col("__t1"))
            .alias("first_touch"),
            F.when(F.col("__fp") == 1, F.lit(DIRECT_CHANNEL))
            .otherwise(F.col("__tl"))
            .alias("last_touch"),
        )
    )


def touch_attribution(
    events: DataFrame,
    gap: int,
    conversion: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First/last-touch attribution: ``(channel:string,
    first_touch_conversions:long, last_touch_conversions:long)`` — for
    every converting session (first ``conversion``-type event in session
    order), one first-touch credit to the session-opening channel and
    one last-touch credit to the channel immediately before the
    conversion; ``(direct)`` when the conversion opens the session.
    Both credit columns total the number of converting sessions."""
    per_session = session_credits(
        events, gap, conversion, user_col, ts_col, id_col, type_col
    )

    # ONE pass to both totals: a per-side groupBy + full-outer channel
    # join would make Spark recompute the whole per-session pipeline per
    # side — two corpus scans, two user exchanges (the same
    # subtree-duplication class the MMR plan audit caught). Instead,
    # unpivot the two credits map-side (per-session frame: one row per
    # converting session) and take conditional counts in a single
    # channel groupBy.
    credit = per_session.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("first_touch").alias("channel"),
                    F.lit(True).alias("is_first"),
                ),
                F.struct(
                    F.col("last_touch").alias("channel"),
                    F.lit(False).alias("is_first"),
                ),
            )
        ).alias("__c")
    )
    return credit.groupBy(F.col("__c.channel").alias("channel")).agg(
        F.count(F.when(F.col("__c.is_first"), F.lit(1)))
        .cast("long")
        .alias("first_touch_conversions"),
        F.count(F.when(~F.col("__c.is_first"), F.lit(1)))
        .cast("long")
        .alias("last_touch_conversions"),
    )


def session_paths(
    events: DataFrame,
    gap: int,
    max_steps: int = 5,
    top_k: int = 20,
    sep: str = ">",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top-k session journeys: ``(path:string, sessions:long)`` — each
    session's first ``max_steps`` event types (in ``(ts, id)`` order)
    joined with ``sep``, counted across all sessions, ordered by
    ``(sessions DESC, path)`` and truncated to ``top_k`` rows.

    The session-path miner of product analytics ("what do users DO in a
    session"), session-bounded and order-exact — distinct from the
    registered `event_transitions` (a global consecutive-PAIR Markov
    matrix per user: no session boundaries, no whole journeys) and from
    `tokenize_event_seqs` (MEDS training-sequence tokenization).

    Scale: the same ONE corpus exchange as the rest of this module —
    the row-number window and the per-(user, session) collect reuse the
    user partitioning; rows beyond ``max_steps`` are dropped map-side
    BEFORE the collect, so the collected lists are <= max_steps structs
    regardless of session length (never an unbounded per-group
    collect_list); the path table that reaches the final count is one
    <= max_steps-type string per session, and the count groupBy keys on
    a low-cardinality path domain (<= |event types|^max_steps, in
    practice a few thousand) — a k-row frame for the closing sort."""
    if max_steps < 1:
        raise ValueError("max_steps must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    s = assign_sessions(events, gap, user_col, ts_col, id_col, type_col)
    w_ord = Window.partitionBy(user_col, "__sid").orderBy("__tu", "__eid")
    paths = (
        s.withColumn("__rn", F.row_number().over(w_ord))
        .filter(F.col("__rn") <= max_steps)
        .groupBy(user_col, "__sid")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__rn", F.col(type_col)))
                    ),
                    lambda x: x[type_col],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("sessions"))
        .orderBy(F.col("sessions").desc(), "path")
        .limit(top_k)
    )
