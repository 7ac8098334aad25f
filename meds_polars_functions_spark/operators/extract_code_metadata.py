"""Code-metadata extraction & enrichment (SURVEY §2.3 J6, §2.4 A8).

Reference: src/MEDS_transforms/extract/extract_code_metadata.py — harvest
(code, description, parent_codes) rows from raw metadata tables, merge
duplicate codes by concatenating descriptions / flattening parent-code
lists (:418-430), and full-outer-join into the existing codes.parquet
with per-column coalesce (:437-440).

Scale: all metadata-scale; the joins stay broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_duplicate_codes(df: DataFrame, description_separator: str = ";") -> DataFrame:
    """group_by(code): concat descriptions, flatten+dedup parent_codes
    (reference extract_code_metadata.py:418-430)."""
    return df.groupBy("code").agg(
        F.concat_ws(
            description_separator,
            F.sort_array(F.collect_list("description")),
        ).alias("description"),
        F.array_distinct(
            F.flatten(F.collect_list(F.coalesce("parent_codes", F.array())))
        ).alias("parent_codes"),
    )


def enrich_code_metadata(existing: DataFrame, new: DataFrame) -> DataFrame:
    """Full-outer join on code, coalescing overlapping columns (existing
    wins), keeping all columns of both (reference :437-440).

    Right-side columns are pre-renamed so the join stays unambiguous even
    when both inputs derive from the same frame (self-join lineage)."""
    shared = [c for c in existing.columns if c in new.columns]
    only_nw = [c for c in new.columns if c not in existing.columns]
    nw = new
    for c in shared:
        nw = nw.withColumnRenamed(c, f"__{c}__nw")
    joined = existing.join(
        nw, F.col("code").eqNullSafe(F.col("__code__nw")), "full"
    )
    cols = [F.coalesce(F.col(c), F.col(f"__{c}__nw")).alias(c) for c in shared]
    cols += [F.col(c) for c in existing.columns if c not in shared]
    cols += [F.col(c) for c in only_nw]
    return joined.select(*cols)
