"""Outlier occlusion (SURVEY §2.3 J3).

Reference: src/MEDS_transforms/transforms/occlude_outliers.py:80-99 —
left-join per-code mean/std (derived from values/sum, values/sum_sqd,
values/n_occurrences) and null out numeric values outside
mean ± stddev_cutoff * std, marking occluded rows.

Spark mapping: broadcast left join on the metadata-scale stats table +
pure column expressions. At 100 TB: no fact-table shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expr import null_safe_join


def occlude_outliers(
    df: DataFrame,
    code_metadata: DataFrame,
    stddev_cutoff: float = 4.5,
    code_modifiers: Sequence[str] = (),
) -> DataFrame:
    """Null out numeric_value beyond mean ± cutoff*std; add
    ``numeric_value/is_inlier`` (null where no value), matching the
    reference's output columns (occlude_outliers.py:80-99)."""
    keys = ["code", *code_modifiers]
    stats = code_metadata.select(
        *keys,
        (F.col("values/sum") / F.col("values/n_occurrences")).alias("__mean__"),
        F.sqrt(
            F.col("values/sum_sqd") / F.col("values/n_occurrences")
            - (F.col("values/sum") / F.col("values/n_occurrences")) ** 2
        ).alias("__std__"),
    )
    joined = null_safe_join(df, stats, on=keys, how="left", broadcast_right=True)
    val = F.col("numeric_value")
    is_inlier = (
        (val - F.col("__mean__")).between(
            -stddev_cutoff * F.col("__std__"), stddev_cutoff * F.col("__std__")
        )
    )
    return (
        joined.withColumn(
            "numeric_value/is_inlier",
            F.when(val.isNotNull(), F.coalesce(is_inlier, F.lit(False))),
        )
        .withColumn(
            "numeric_value",
            F.when(F.col("numeric_value/is_inlier"), val),
        )
        .drop("__mean__", "__std__")
    )
