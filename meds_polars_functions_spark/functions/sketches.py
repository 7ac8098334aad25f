"""Mergeable distinct-count sketches (Apache DataSketches HLL, native in
Spark — ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

Beyond-reference scale extension of the reference's mergeable-statistics
convention (aggregate_code_metadata.py:33-41 stores sum/sum² so shards
re-aggregate without recompute): distinct counts are the ONE stat in the
code-metadata aggregation (A1: ``n_unique(patient_id)``) that is not
algebraic — exact ``countDistinct`` cannot be merged across pre-agged
shards/datasets. An HLL sketch column can: union is lossless between
sketches of the same lgK, so per-dataset metadata tables merge by
``hll_union_agg`` with no re-scan of the facts. At 100 TB this is the
difference between re-reading every dataset to refresh global code
stats and a metadata-sized union.

Accuracy: exact in sparse mode (cardinality ≲ 2^lgK/4), ~0.4-1.6%
relative error above it (lgK 12 default). All JVM-native — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col``: one exchange with
    map-side partial sketches (the sketch IS the combine state), output
    one binary column per group — storable in parquet next to the other
    mergeable aggregates."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(out_col)
    )


def merge_sketch_tables(
    tables: list[DataFrame],
    group_cols: list[str],
    sketch_col: str,
) -> DataFrame:
    """Reduce pre-sketched tables (per shard / per dataset) into one:
    union + ``hll_union_agg`` per group. Lossless for equal-lgK sketches;
    the analogue of the reference's shard reducer (A3/J5) for the
    non-algebraic distinct count."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def estimate_sketch(df: DataFrame, sketch_col: str, out_col: str | None = None) -> DataFrame:
    """Replace a binary sketch column with its cardinality estimate."""
    out_col = out_col or sketch_col
    return df.withColumn(out_col, F.hll_sketch_estimate(sketch_col)).drop(
        *([] if out_col == sketch_col else [sketch_col])
    )
