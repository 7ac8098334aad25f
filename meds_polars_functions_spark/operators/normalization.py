"""Normalization (SURVEY §2.3 J2).

Reference: src/MEDS_transforms/transforms/normalization.py:60-211 —
inner-join data with code metadata (``join_nulls=True``) to fetch the
code's vocab index and value mean/std, emit ``code -> code/vocab_index``
(int) and ``numeric_value -> (value - mean) / std``.

Spark mapping: broadcast inner join with null-safe key equality
(``eqNullSafe``) for nullable modifier keys — the direct analogue of
Polars ``join_nulls=True``. Inner join doubles as the "drop codes not in
vocabulary" filter, same as the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expr import null_safe_join


def normalize(
    df: DataFrame,
    code_metadata: DataFrame,
    code_modifiers: Sequence[str] = (),
) -> DataFrame:
    """Normalize codes to vocab indices and values to z-scores.

    ``code_metadata`` must carry ``code/vocab_index`` plus ``values/sum``,
    ``values/sum_sqd``, ``values/n_occurrences`` (the mergeable stats — we
    derive mean/std at use-site exactly like the reference's
    ``values/mean``/``values/std`` derivation).
    """
    keys = ["code", *code_modifiers]
    mean = F.col("values/sum") / F.col("values/n_occurrences")
    var = F.col("values/sum_sqd") / F.col("values/n_occurrences") - mean**2
    meta = code_metadata.select(
        *keys,
        F.col("code/vocab_index").alias("__vocab__"),
        mean.alias("__mean__"),
        F.sqrt(var).alias("__std__"),
    )
    joined = null_safe_join(df, meta, on=keys, how="inner", broadcast_right=True)
    passthrough = [
        c
        for c in df.columns
        if c not in {"code", "numeric_value", *code_modifiers}
    ]
    # Polars semantics for constant codes (std == 0): (v-mean)/0 is NaN
    # when v == mean else ±inf. Spark's non-ANSI x/0.0 is NULL, which
    # would conflate "present but constant" with "absent" — make the
    # reference behavior explicit. v NULL falls through every branch to
    # NULL, as it should.
    v, mean, std = F.col("numeric_value"), F.col("__mean__"), F.col("__std__")
    z = (
        F.when(std != 0, (v - mean) / std)
        .when(v == mean, F.lit(float("nan")))
        .when(v > mean, F.lit(float("inf")))
        .when(v < mean, F.lit(float("-inf")))
    )
    return joined.select(
        *passthrough,
        F.col("__vocab__").cast("long").alias("code"),
        z.alias("numeric_value"),
    )
