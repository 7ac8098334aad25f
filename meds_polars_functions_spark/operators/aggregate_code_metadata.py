"""Code-metadata aggregation (SURVEY §2.4 A1/A2/A3).

Reference: src/MEDS_transforms/aggregate_code_metadata.py — the reference
splits this into a per-shard mapper (group_by + agg, :189-376), a filesystem
polling barrier, and an N-way outer-join reducer with horizontal sums
(:522-548). In Spark the mapper/reducer split **dissolves**: a single
``groupBy().agg()`` already executes as partial (map-side) + final
(reduce-side) hash aggregation — the same algebraic decomposition, done by
the engine. We keep the reference's re-aggregatable schema convention
(store ``values/sum`` and ``values/sum_sqd``, never mean/std) so stats
stay mergeable across datasets.

Scale: one shuffle on the (code, *modifiers) key. Code cardinality is
metadata-scale (≪ data), and map-side combine collapses the fact rows
before the exchange, so this holds at 100 TB. Skewed codes (a handful of
ultra-common codes) are handled by AQE skew handling plus the partial agg.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _agg_exprs() -> dict[str, Column]:
    """The reference's aggregation table (aggregate_code_metadata.py:104-116)
    as Spark aggregate expressions. All are algebraic/partial-aggregatable.

    Built lazily (Columns need an active SparkContext)."""
    val = F.col("numeric_value")
    # Non-null, non-NaN guard (reference aggregate_code_metadata.py:100-102).
    present = val.isNotNull() & ~F.isnan(val)
    is_int = F.round(val) == val
    filtered = lambda e: F.when(present, e)  # noqa: E731
    return {
        "code/n_patients": F.countDistinct("patient_id"),
        "code/n_occurrences": F.count(F.lit(1)),
        "values/n_patients": F.countDistinct(filtered(F.col("patient_id"))),
        "values/n_occurrences": F.count(filtered(val)),
        "values/n_ints": F.count(F.when(present & is_int, F.lit(1))),
        "values/sum": F.coalesce(F.sum(filtered(val)), F.lit(0.0)),
        "values/sum_sqd": F.coalesce(F.sum(filtered(val * val)), F.lit(0.0)),
        "values/min": F.min(filtered(val)),
        "values/max": F.max(filtered(val)),
    }


ALL_AGGREGATIONS = (
    "code/n_patients",
    "code/n_occurrences",
    "values/n_patients",
    "values/n_occurrences",
    "values/n_ints",
    "values/sum",
    "values/sum_sqd",
    "values/min",
    "values/max",
)


def aggregate_code_metadata(
    df: DataFrame,
    aggregations: Sequence[str] = ALL_AGGREGATIONS,
    code_modifiers: Sequence[str] = (),
    do_summarize_over_all_codes: bool = False,
) -> DataFrame:
    """group_by(code, *modifiers).agg(<selected aggs>).

    ``do_summarize_over_all_codes`` adds the global (code IS NULL) summary
    row the reference appends via diagonal concat
    (aggregate_code_metadata.py:361-371); here it is a native
    ``GROUPING SETS ((code,...), ())`` — one pass, no union.
    """
    exprs = _agg_exprs()
    unknown = [a for a in aggregations if a not in exprs]
    if unknown:
        raise ValueError(f"unknown aggregations: {unknown}; valid: {list(exprs)}")
    keys = ["code", *code_modifiers]
    aggs = [exprs[a].alias(a) for a in aggregations]
    if do_summarize_over_all_codes:
        # rollup + grouping_id: gid==0 is the full (code, *modifiers) key,
        # gid==2^n-1 the grand total. Filtering on grouping_id (NOT on key
        # nullness) keeps groups whose key values are legitimately NULL
        # distinct from rolled-up rows — cube/null-filtering conflates
        # them and both drops null-modifier groups and duplicates the
        # all-NULL row.
        full_gid = 0
        total_gid = (1 << len(keys)) - 1
        out = (
            df.rollup(*keys)
            .agg(*aggs, F.grouping_id().alias("__gid__"))
            .filter(F.col("__gid__").isin(full_gid, total_gid))
            .drop("__gid__")
        )
        return out
    return df.groupBy(*keys).agg(*aggs)


def merge_pre_aggregated(frames: Sequence[DataFrame], code_modifiers: Sequence[str] = ()) -> DataFrame:
    """Re-aggregate already-aggregated metadata tables (the reference's
    reducer, aggregate_code_metadata.py:522-548, for when inputs arrive
    pre-aggregated rather than raw): union-by-name + sum/min/max re-agg.
    Valid because the stored stats are algebraic (sums, counts, extrema)
    — with one caveat: the ``*/n_patients`` columns are DISTINCT counts,
    algebraic across shards only when shards are PATIENT-DISJOINT (the
    reference's patient-sharded layout guarantees this; summing them
    over patient-overlapping shards double-counts). For merging
    arbitrary-overlap datasets use the HLL/bitmap state tables in
    functions/sketches.py instead."""
    from functools import reduce

    keys = ["code", *code_modifiers]
    unioned = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
    sum_cols = [c for c in unioned.columns if c.startswith(("code/", "values/")) and not c.endswith(("min", "max"))]
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    if "values/min" in unioned.columns:
        aggs.append(F.min("values/min").alias("values/min"))
    if "values/max" in unioned.columns:
        aggs.append(F.max("values/max").alias("values/max"))
    return unioned.groupBy(*keys).agg(*aggs)


def code_hierarchy_rollup(
    df: DataFrame,
    code_col: str = "code",
    value_col: str | None = None,
    sep: str = "//",
) -> DataFrame:
    """Aggregate at EVERY level of the ``//``-joined code hierarchy (the
    MEDS code convention this engine builds via ``code_expr``):
    ``ICD//9//428//22`` contributes to ``ICD``, ``ICD//9``,
    ``ICD//9//428`` and itself — the ontology-rollup view clinical /
    taxonomy dashboards aggregate over (reference codes carry
    parent_codes in metadata, extract_code_metadata.py; this computes
    the transitive rollup directly from the data).

    Scale design: prefixes are generated MAP-SIDE with a native
    array fold over the split code (depth-bounded explode — the ×depth
    fan-out is the hierarchy depth, a small constant), then ONE
    partial-aggregated groupBy on the prefix. Equivalent to a
    grouping-sets rollup but keyed by the code's own structure instead
    of fixed columns. Returns (code_prefix, level, n, n_codes
    [, value_sum])."""
    import re as _re

    # F.split takes a regex, concat_ws a literal — escape so any sep works
    parts = F.split(F.col(code_col), _re.escape(sep))
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda k: F.struct(
            F.concat_ws(sep, F.slice(parts, 1, k)).alias("code_prefix"),
            k.alias("level"),
        ),
    )
    exploded = df.select(
        F.explode(prefixes).alias("__p__"),
        F.col(code_col).alias("__full__"),
        *([F.col(value_col).alias("__v__")] if value_col else []),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("__full__").alias("n_codes"),
    ]
    if value_col:
        aggs.append(F.sum("__v__").alias("value_sum"))
    return exploded.groupBy(
        F.col("__p__.code_prefix").alias("code_prefix"),
        F.col("__p__.level").alias("level"),
    ).agg(*aggs)
