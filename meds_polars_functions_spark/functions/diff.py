"""Keyed snapshot diff (CDC-style): classify every key across two table
versions as added / removed / changed / unchanged.

The nightly-pipeline primitive for incremental processing: diff
yesterday's curated corpus against today's, reprocess only
added+changed. One FULL OUTER hash join on the key — both sides shuffle
once on the same key (co-partitioned; bucketed layouts make it
exchange-free), comparisons are null-safe column expressions in
whole-stage codegen, and nothing is collected or recomputed per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff ``right`` (new) against ``left`` (old) by key.

    Returns one row per key present in either side: the key columns plus
    ``diff_status`` ∈ {'added', 'removed', 'changed', 'unchanged'}
    ('added' = only in right, 'removed' = only in left; 'changed' uses a
    null-safe comparison over ``compare_cols``, default = all shared
    non-key columns).
    """
    keys = list(key_cols)
    cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in left.columns if c in set(right.columns) and c not in keys]
    )
    l = left.select(
        *[F.col(k).alias(f"__lk_{k}__") for k in keys],
        *[F.col(c).alias(f"__l_{c}__") for c in cols],
        F.lit(1).alias("__in_l__"),
    )
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}__") for k in keys],
        *[F.col(c).alias(f"__r_{c}__") for c in cols],
        F.lit(1).alias("__in_r__"),
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__lk_{k}__") == F.col(f"__rk_{k}__"))
    j = l.join(r, cond, "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"__l_{c}__").eqNullSafe(F.col(f"__r_{c}__"))
    status = (
        F.when(F.col("__in_l__").isNull(), F.lit("added"))
        .when(F.col("__in_r__").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__lk_{k}__"), F.col(f"__rk_{k}__")).alias(k)
            for k in keys
        ],
        status.alias("diff_status"),
    )
