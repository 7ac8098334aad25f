"""Cohort merge + canonical MEDS sort (SURVEY §2.6 O1, §2.7 U1/U2).

Reference: src/MEDS_transforms/extract/merge_to_MEDS_cohort.py:169-198 —
diagonally concatenate per-prefix shard frames, dedup whole rows
(keep-first in frame order), then a single-threaded stable sort by
(patient_id, time, *extra).

Spark mapping: ``unionByName(allowMissingColumns=True)`` with explicit
supertype pre-casts (Spark will not auto-relax int vs double across
frames, SURVEY §7.3 risk 4), ``dropDuplicates`` for the unordered dedup
(the reference explicitly documents the kept row as non-guaranteed,
merge_to_MEDS_cohort.py:27-31), and
``repartition(patient_id).sortWithinPartitions(...)`` for the canonical
order — per-partition sorted runs co-located by patient, which is the
layout every downstream window op wants; no global total sort (and hence
no range-exchange) is needed.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_RANK = {
    "tinyint": 0,
    "smallint": 1,
    "int": 2,
    "bigint": 3,
    "float": 4,
    "double": 5,
}


def _supertype(a: str, b: str) -> str:
    if a == b:
        return a
    if a in _NUMERIC_RANK and b in _NUMERIC_RANK:
        # any int mixed with float/double -> double to avoid precision loss
        if max(_NUMERIC_RANK[a], _NUMERIC_RANK[b]) >= 4 and min(
            _NUMERIC_RANK[a], _NUMERIC_RANK[b]
        ) <= 3:
            return "double"
        return a if _NUMERIC_RANK[a] >= _NUMERIC_RANK[b] else b
    return "string"


def union_by_name_relaxed(frames: Sequence[DataFrame]) -> DataFrame:
    """Diagonal concat: union by name, missing columns -> null, conflicting
    primitive types -> common supertype (Polars ``how="diagonal_relaxed"``,
    reference convert_to_sharded_events.py:668)."""
    types: dict[str, str] = {}
    order: list[str] = []
    for f in frames:
        for field in f.schema.fields:
            name, dt = field.name, field.dataType.simpleString()
            if name not in types:
                types[name] = dt
                order.append(name)
            else:
                types[name] = _supertype(types[name], dt)
    casted = []
    for f in frames:
        cols = [
            F.col(c).cast(types[c]).alias(c) if c in f.columns else F.lit(None).cast(types[c]).alias(c)
            for c in order
        ]
        casted.append(f.select(*cols))
    return reduce(lambda a, b: a.unionByName(b), casted)


def merge_and_sort(
    frames: Sequence[DataFrame],
    additional_sort_by: Sequence[str] = (),
    unique: bool = True,
) -> DataFrame:
    """Union shards, dedup, canonical (patient_id, time nulls-first) sort."""
    df = union_by_name_relaxed(frames) if len(frames) > 1 else frames[0]
    if unique:
        df = df.dropDuplicates()
    return canonical_sort(df, additional_sort_by)


def canonical_sort(df: DataFrame, additional_sort_by: Sequence[str] = ()) -> DataFrame:
    """The MEDS order invariant: co-locate by patient, sort runs within
    partitions. Static rows (null time) come first per patient."""
    extra = [F.col(c) for c in additional_sort_by]
    return df.repartition("patient_id").sortWithinPartitions(
        F.col("patient_id"), F.asc_nulls_first("time"), *extra
    )
