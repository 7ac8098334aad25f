"""Tokenization: flat MEDS table -> per-patient nested sequences
(SURVEY §2.4 A4/A5, §2.5 W4, §2.8 X3).

Reference: src/MEDS_transforms/transforms/tokenization.py.

Spark mapping: Spark's ``collect_list`` has no deterministic order, so
every nested collect goes through ``sort_array(collect_list(struct(sort_key,
payload)))`` — the struct sort forces the canonical (time, original
position) order *inside the aggregation*, independent of partitioning.
This is the explicit-order discipline of SURVEY §1.5 applied to A4/A5:
correctness does not depend on a prior sort surviving a shuffle, so the
plan stays valid under AQE re-partitioning at any scale. One shuffle per
groupBy on patient_id (elided when already partitioned by patient).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86400.0


def split_static_and_dynamic(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partition rows on ``time IS NULL`` (reference tokenization.py:59-104).
    Two filters over one scan — Catalyst shares the underlying relation."""
    return df.filter(F.col("time").isNull()), df.filter(F.col("time").isNotNull())


def _ordered_list(payload: str, order_cols: list[str]) -> F.Column:
    """collect payload ordered by order_cols: sort_array over structs."""
    struct = F.struct(*[F.col(c) for c in order_cols], F.col(payload).alias("__v__"))
    return F.transform(
        F.sort_array(F.collect_list(struct)), lambda s: s["__v__"]
    )


def extract_statics_and_schema(df: DataFrame, order_col: str | None = None) -> DataFrame:
    """Per-patient static codes/values + event-time schema
    (reference tokenization.py:107-163).

    Output: ``patient_id, code: array<...>, numeric_value: array<float>,
    start_time: timestamp, time: array<timestamp>`` (unique, ascending).

    ``order_col``: explicit intra-patient ordering column; defaults to the
    incoming physical row order (monotonically_increasing_id), which is
    only meaningful when upstream wrote patient-sorted shards — prefer an
    explicit key at scale.
    """
    static, dynamic = split_static_and_dynamic(df)
    if order_col is None:
        static = static.withColumn("__pos__", F.monotonically_increasing_id())
        order_col = "__pos__"
    statics = static.groupBy("patient_id").agg(
        _ordered_list("code", [order_col]).alias("code"),
        _ordered_list("numeric_value", [order_col]).alias("numeric_value"),
    )
    schema = dynamic.groupBy("patient_id").agg(
        F.min("time").alias("start_time"),
        F.array_sort(F.array_distinct(F.collect_list("time"))).alias("time"),
    )
    # Inner join per reference tokenization.py:163 (J7): patient-keyed,
    # both sides already hashed on patient_id -> no extra shuffle.
    return statics.join(schema, on="patient_id", how="inner")


def extract_seq_of_patient_events(
    df: DataFrame,
    order_col: str | None = None,
    code_as_double: bool = True,
    nan_fill: bool = True,
) -> DataFrame:
    """Doubly-nested event sequences (reference tokenization.py:166-216).

    Output: ``patient_id, time_delta_days: array<double>,
    code: array<array<double>>, numeric_value: array<array<double>>`` —
    outer lists ordered by event time, inner lists by original row order
    within the event; nulls/±inf filled to NaN (reference fill_to_nans).

    ``code_as_double``/``nan_fill`` reproduce the reference's
    normalized-input behavior (codes already vocab ints); disable them to
    tokenize un-normalized codes (string lists, null first delta).
    """
    from ..functions.expr import fill_to_nans

    _, dynamic = split_static_and_dynamic(df)
    if order_col is None:
        dynamic = dynamic.withColumn("__pos__", F.monotonically_increasing_id())
        order_col = "__pos__"

    nan = F.lit(float("nan")) if nan_fill else F.lit(None).cast("double")
    fill = lambda c: fill_to_nans(c, fill=nan)  # noqa: E731
    code_fn = (lambda c: fill(c.cast("double"))) if code_as_double else (lambda c: c)

    events = dynamic.groupBy("patient_id", "time").agg(
        _ordered_list("code", [order_col]).alias("__codes__"),
        _ordered_list("numeric_value", [order_col]).alias("__vals__"),
    )
    per_event = events.select(
        "patient_id",
        "time",
        F.transform("__codes__", code_fn).alias("__codes__"),
        F.transform("__vals__", lambda v: fill(v.cast("double"))).alias("__vals__"),
    )
    collected = per_event.groupBy("patient_id").agg(
        F.sort_array(
            F.collect_list(F.struct("time", "__codes__", "__vals__"))
        ).alias("__events__")
    )
    # NTZ-safe epoch seconds (expr.epoch_seconds inlined for the lambda over
    # struct fields): TIMESTAMP_NTZ -> TIMESTAMP is a legal relabel under the
    # pinned UTC zone; NTZ -> DOUBLE directly is not.
    ts = lambda s: s["time"].cast("timestamp").cast("double")  # noqa: E731
    return collected.select(
        "patient_id",
        F.transform(
            "__events__",
            lambda s, i: F.when(i == 0, nan).otherwise(
                (ts(s) - ts(F.element_at("__events__", i)))  # i is 0-based; element_at 1-based -> previous
                / F.lit(SECONDS_PER_DAY)
            ),
        ).alias("time_delta_days"),
        F.transform("__events__", lambda s: s["__codes__"]).alias("code"),
        F.transform("__events__", lambda s: s["__vals__"]).alias("numeric_value"),
    )
