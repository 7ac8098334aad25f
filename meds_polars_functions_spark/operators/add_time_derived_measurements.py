"""Time-derived measurements: age & time-of-day events (SURVEY §2.5 W3, §2.6 O3).

Reference: src/MEDS_transforms/transforms/add_time_derived_measurements.py.

Spark mapping: the DOB lookup is a conditional-min window over patient
(W3); new events are interleaved with a union plus an explicit
``(patient_id, time, __idx)`` sort key so derived events precede same-time
originals (O3) — the reference's implicit row-order trick made explicit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expr import epoch_seconds, normalize_time_unit

MICROSECONDS = {
    "seconds": 1e6,
}


def age_events(
    df: DataFrame,
    dob_code: str = "DOB",
    age_code: str = "AGE",
    age_unit: str = "years",
) -> DataFrame:
    """One AGE event per (patient, unique non-null time) after DOB
    (reference add_time_derived_measurements.py:172-267).

    age = (time - min(time where code==DOB over patient)) / unit; rows at or
    before DOB (age<=0) and null ages are dropped; output is deduplicated
    per (patient_id, time).
    """
    _, seconds_in_unit = normalize_time_unit(age_unit)
    w = Window.partitionBy("patient_id")
    dob = F.min(F.when(F.col("code") == dob_code, F.col("time"))).over(w)
    # µs-precision difference, matching dt.total_microseconds()/µs_in_unit;
    # epoch_seconds is NTZ-safe (expr.py): direct NTZ->DOUBLE casts are illegal
    age = (epoch_seconds(F.col("time")) - epoch_seconds(dob)) / F.lit(seconds_in_unit)
    out = (
        df.withColumn("numeric_value", age)
        .filter(F.col("numeric_value").isNotNull() & (F.col("numeric_value") > 0))
        .withColumn("code", F.lit(age_code))
        .select("patient_id", "time", "code", "numeric_value")
        .dropDuplicates(["patient_id", "time"])
    )
    return out


def time_of_day_events(
    df: DataFrame,
    time_of_day_code: str = "TIME_OF_DAY",
    endpoints: Sequence[int] = (6, 12, 18),
) -> DataFrame:
    """One time-of-day bucket event per (patient, unique non-null time)
    (reference add_time_derived_measurements.py:270-360). Bucket labels are
    ``{code}//[{start:02},{end:02})`` over [0, *endpoints, 24)."""
    bounds = [0, *endpoints, 24]
    hour = F.hour("time")
    expr = None
    for start, end in zip(bounds[:-1], bounds[1:]):
        label = F.lit(f"{time_of_day_code}//[{start:02},{end:02})")
        cond = (hour >= start) & (hour < end)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return (
        df.filter(F.col("time").isNotNull())
        .select(
            "patient_id",
            "time",
            expr.alias("code"),
            F.lit(None).cast("float").alias("numeric_value"),
        )
        .dropDuplicates(["patient_id", "time"])
    )


def add_new_events(df: DataFrame, new_events: DataFrame) -> DataFrame:
    """Interleave derived events before same-time originals
    (reference add_time_derived_measurements.py:14-102): originals get
    ``__idx=1``, new events ``__idx=0``; sort ``(patient_id, time nulls
    first, __idx)``; drop the tiebreaker. Order survives as an explicit
    sort invariant, not frame state."""
    tagged_old = df.withColumn("__idx__", F.lit(1))
    tagged_new = new_events.withColumn("__idx__", F.lit(0))
    unioned = tagged_old.unionByName(tagged_new, allowMissingColumns=True)
    return (
        unioned.repartition("patient_id")
        .sortWithinPartitions(F.col("patient_id"), F.asc_nulls_first("time"), "__idx__")
        .drop("__idx__")
    )


def add_time_derived_measurements(df: DataFrame, cfg: dict) -> DataFrame:
    """Stage entry: cfg keys ``age`` / ``time_of_day`` with their sub-configs
    (reference add_time_derived_measurements.py main loop)."""
    out = df
    if "age" in cfg:
        a = cfg["age"]
        out = add_new_events(
            out,
            age_events(
                df,
                dob_code=a.get("DOB_code", "DOB"),
                age_code=a.get("age_code", "AGE"),
                age_unit=a.get("age_unit", "years"),
            ),
        )
    if "time_of_day" in cfg:
        t = cfg["time_of_day"]
        out = add_new_events(
            out,
            time_of_day_events(
                df,
                time_of_day_code=t.get("time_of_day_code", "TIME_OF_DAY"),
                endpoints=t.get("endpoints", (6, 12, 18)),
            ),
        )
    return out
