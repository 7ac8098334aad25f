"""Measurement-level filter (SURVEY §2.3 J1).

Reference: src/MEDS_transforms/filters/filter_measurements.py:114-137 —
inner-join the data against the subset of code metadata passing
min_patients_per_code / min_occurrences_per_code, then restore row order
via a stashed row index.

Spark mapping: the allowed-codes table is metadata-scale, so this is a
**broadcast left-semi join** — zero shuffle of the fact table, the filter
effectively becomes a bloom-style probe executor-side. Row-order
restoration is unnecessary (order is an explicit sort invariant here, not
implicit frame state), which removes the reference's row-index round-trip.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def allowed_codes(
    code_metadata: DataFrame,
    min_patients_per_code: int | None = None,
    min_occurrences_per_code: int | None = None,
    code_modifiers: Sequence[str] = (),
) -> DataFrame:
    """Project code metadata down to codes passing the thresholds
    (reference filter_measurements.py:114-126)."""
    cond = F.lit(True)
    if min_patients_per_code is not None:
        cond = cond & (F.col("code/n_patients") >= min_patients_per_code)
    if min_occurrences_per_code is not None:
        cond = cond & (F.col("code/n_occurrences") >= min_occurrences_per_code)
    return code_metadata.filter(cond).select("code", *code_modifiers)


def filter_measurements(
    df: DataFrame,
    code_metadata: DataFrame,
    min_patients_per_code: int | None = None,
    min_occurrences_per_code: int | None = None,
    code_modifiers: Sequence[str] = (),
) -> DataFrame:
    """Keep measurements whose code passes the thresholds."""
    if min_patients_per_code is None and min_occurrences_per_code is None:
        # no thresholds -> no-op (reference filter_measurements.py:111-112);
        # semi-joining anyway would silently drop codes absent from an
        # externally-supplied metadata table
        return df
    allowed = allowed_codes(
        code_metadata, min_patients_per_code, min_occurrences_per_code, code_modifiers
    )
    return df.join(F.broadcast(allowed), on=["code", *code_modifiers], how="left_semi")
