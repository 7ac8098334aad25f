"""Patient-level filters (SURVEY §2.5 W1/W2).

Reference: src/MEDS_transforms/filters/filter_patients.py:15-194.

Spark mapping: window counts over ``partitionBy(patient_id)``. No join, no
extra shuffle beyond the single hash-partition by patient — and when the
data is already partitioned by patient (the engine's canonical layout),
the exchange is elided entirely. Distinct-count-over-window has no native
Spark form, so W2 uses ``size(collect_set(...))`` which is exactly a
distinct count, computed partially per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_patients_by_num_measurements(df: DataFrame, min_measurements: int) -> DataFrame:
    """Keep patients with >= min_measurements rows
    (reference filter_patients.py:15-87)."""
    w = Window.partitionBy("patient_id")
    return (
        df.withColumn("__n__", F.count(F.lit(1)).over(w))
        .filter(F.col("__n__") >= min_measurements)
        .drop("__n__")
    )


def filter_patients_by_num_events(df: DataFrame, min_events: int) -> DataFrame:
    """Keep patients with >= min_events distinct (non-null) times
    (reference filter_patients.py:90-194). An "event" is a unique timestamp;
    the reference's n_unique counts null as a distinct value, collect_set
    does not — count it back explicitly."""
    w = Window.partitionBy("patient_id")
    n_unique = F.size(F.collect_set("time").over(w)) + F.max(
        F.when(F.col("time").isNull(), 1).otherwise(0)
    ).over(w)
    return (
        df.withColumn("__n__", n_unique)
        .filter(F.col("__n__") >= min_events)
        .drop("__n__")
    )


def filter_patients(
    df: DataFrame,
    min_measurements: int | None = None,
    min_events: int | None = None,
) -> DataFrame:
    """Composite stage entry point (reference filter_patients.py main)."""
    out = df
    if min_measurements is not None:
        out = filter_patients_by_num_measurements(out, min_measurements)
    if min_events is not None:
        out = filter_patients_by_num_events(out, min_events)
    return out
