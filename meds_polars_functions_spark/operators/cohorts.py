"""Retention-cohort analytics: cohort-period × period-offset user counts.

Beyond-reference operator family (the reference — a MEDS/Polars ETL
library — has no behavioral-analytics surface; sibling module:
operators/funnel.py). The classic product-analytics retention matrix:

    cohort(user)  = the period (day / ISO week / calendar month) of the
                    user's FIRST event
    retained(c,o) = # users of cohort c active in period c + o

Semantics are definitional and fully SQL-expressible, so the DuckDB
oracle is a two-CTE replay (distinct user-periods, per-user min, join,
count).

100 TB design — all JVM-side, exactly TWO shuffles:

- Period indices are computed map-side as plain integers (epoch-day for
  day/week via ``unix_date``, ``year*12+month`` for month) — integer
  arithmetic from there on, no session-zone traps beyond the pinned UTC.
- The naive plan (distinct user-periods JOIN per-user cohort minima)
  shuffles the activity table twice and joins two corpus-keyed frames.
  Instead: ONE ``groupBy(user)`` computes ``min(period)`` AND
  ``collect_set(period)`` together — the set of DISTINCT ACTIVE PERIODS
  per user is inherently tiny (a user active every week for 20 years is
  ~1000 entries), so this is a bounded-state aggregate with map-side
  partial combine, not a document-scale collect. The explode back to
  (cohort, offset) rows is map-side, and the final
  ``groupBy(cohort, offset)`` — whose key space is periods² — is the
  second (tiny) shuffle. Row counts ARE distinct-user counts because
  each (user, period) survives the set exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["retention_cohorts"]

#: period -> (index expression builder, offset divisor on that index)
_PERIODS = ("day", "week", "month")


def _period_index(ts: Column, period: str) -> tuple[Column, int]:
    if period == "day":
        return F.unix_date(F.to_date(ts)), 1
    if period == "week":
        # Monday-start truncation, identical grid to DuckDB's
        # date_trunc('week'); the epoch-day delta is always a multiple
        # of 7, divided out so offsets count whole weeks
        return F.unix_date(F.to_date(F.date_trunc("week", ts))), 7
    # month: a dense integer index — month arithmetic, not day arithmetic
    return F.year(ts) * F.lit(12) + F.month(ts), 1


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention matrix ``(cohort:long, period_offset:int, users:long)``.

    ``cohort`` is the period index of the cohort's start — epoch-day of
    the day/week start for ``period in ("day", "week")``, the dense
    ``year*12+month`` index for ``period == "month"``. ``period_offset``
    counts whole periods since the cohort period (the offset-0 row is
    the cohort size). Every user contributes exactly once per active
    period.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {_PERIODS}")

    dtype = dict(events.dtypes).get(ts_col)
    ts = F.col(ts_col)
    if dtype == "timestamp_ntz":
        ts = ts.cast("timestamp")
    idx, divisor = _period_index(ts, period)

    per_user = (
        events.select(F.col(user_col), idx.alias("__pd"))
        .groupBy(user_col)
        .agg(
            F.min("__pd").alias("__cohort"),
            F.collect_set("__pd").alias("__periods"),
        )
    )
    return (
        per_user.select(
            # the index expressions are 32-bit; widen for a stable schema
            F.col("__cohort").cast("long").alias("cohort"),
            F.explode("__periods").alias("__pd"),
        )
        .select(
            "cohort",
            ((F.col("__pd") - F.col("cohort")) / divisor)
            .cast("int")
            .alias("period_offset"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )
