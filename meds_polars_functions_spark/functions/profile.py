"""One-pass table profiling: per-column null count, exact distinct
count, min/max — the "what is this dataset" primitive every curation
pipeline runs before configuring filters (the reference's
aggregate_code_metadata computes the same stats for ONE column pair;
this generalizes to any column set).

Scale design: a single wide aggregate — every per-column stat is one
partial-aggregating expression in the SAME pass, so the table is read
once with full column pruning (only profiled columns reach the scan),
and the result (4 numbers × |columns|) collapses to one row before the
melt. Exact distincts use one `count_distinct` each; Spark plans
multi-distinct aggregates via Expand (one pass, |distinct-cols|×
row-multiplier) — for very wide profiles at extreme scale, swap
`approx=True` to approx_count_distinct and the Expand disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_repr, max_repr).
    min/max are string representations so heterogeneous column types fit
    one result schema; numeric columns format via plain cast.
    """
    cols = columns or df.columns
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}__"))
        nd = (
            F.approx_count_distinct(c)
            if approx
            else F.count_distinct(col)
        )
        aggs.append(nd.alias(f"__nd_{c}__"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}__"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}__"))
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n__").alias("n_rows"),
            F.col(f"__nulls_{c}__").alias("n_nulls"),
            F.col(f"__nd_{c}__").alias("n_distinct"),
            F.col(f"__min_{c}__").alias("min_repr"),
            F.col(f"__max_{c}__").alias("max_repr"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
