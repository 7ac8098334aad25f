"""Measurement reordering within (patient, time) groups (SURVEY §2.3 J4, §2.6 O4, §2.2 P11).

Reference: src/MEDS_transforms/transforms/reorder_measurements.py — each
code is assigned the index of the first ordered regex class it matches
(:126-135), attached via a code→order_idx join (:137-147), then rows are
re-sorted by (patient, time, order_idx).

Spark mapping: the order index is computed as a ``when``-chain of
``rlike`` tests directly on the distinct-code table (metadata-scale),
broadcast-joined back. Sort is the canonical explicit invariant.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def code_order_index(codes: DataFrame, ordered_code_patterns: Sequence[str]) -> DataFrame:
    """code -> index of first matching regex (unmatched codes get
    len(patterns), keeping their relative position at the end)."""
    expr = None
    for i, pat in enumerate(ordered_code_patterns):
        cond = F.col("code").rlike(pat)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    expr = expr.otherwise(F.lit(len(ordered_code_patterns))) if expr is not None else F.lit(0)
    return codes.select("code").distinct().withColumn("__order_idx__", expr)


def reorder_measurements(df: DataFrame, ordered_code_patterns: Sequence[str]) -> DataFrame:
    """Re-sort measurements so codes follow the configured class order
    within each (patient_id, time) group."""
    idx = code_order_index(df, ordered_code_patterns)
    return (
        df.join(F.broadcast(idx), on="code", how="left")
        .repartition("patient_id")
        .sortWithinPartitions(
            F.col("patient_id"), F.asc_nulls_first("time"), F.col("__order_idx__")
        )
        .drop("__order_idx__")
    )
