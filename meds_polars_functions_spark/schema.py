"""Canonical MEDS schemas and schema-finalization helpers.

Mirrors the reference's mandatory types (``MEDS_DATA_MANDATORY_TYPES``,
reference src/MEDS_transforms/extract/__init__.py:16-21) and the
finalize-stage cast-and-reorder semantics
(extract/finalize_MEDS_data.py:15-106).

Spark notes: we keep wide, stable types (Long/Double) internally and only
narrow to the canonical Float32 ``numeric_value`` at finalize, exactly
where the reference does. Dtype "shrinking" of aggregate columns
(reference utils.py:19-52) is a Polars-ism we deliberately skip — parquet
dictionary/byte-packing makes it moot and stable types keep unions cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Mandatory flat measurement-table schema (reference extract/__init__.py:16-21).
MEDS_DATA_MANDATORY_TYPES: dict[str, T.DataType] = {
    "patient_id": T.LongType(),
    "time": T.TimestampType(),  # µs precision, nullable: null == static row
    "code": T.StringType(),
    "numeric_value": T.FloatType(),
}

MEDS_DATA_SCHEMA = T.StructType(
    [T.StructField(name, dtype, True) for name, dtype in MEDS_DATA_MANDATORY_TYPES.items()]
)

#: Mandatory code-metadata columns (reference extract/__init__.py:10-14).
MEDS_METADATA_MANDATORY_TYPES: dict[str, T.DataType] = {
    "code": T.StringType(),
    "description": T.StringType(),
    "parent_codes": T.ArrayType(T.StringType()),
}

#: Patient split table (reference finalize_MEDS_metadata.py:196-217).
PATIENT_SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("patient_id", T.LongType(), False),
        T.StructField("split", T.StringType(), False),
    ]
)


def finalize_data(df: DataFrame, additional_cols: list[str] | None = None) -> DataFrame:
    """Cast to the canonical MEDS data schema, mandatory columns first.

    Reproduces ``get_and_validate_data_schema`` semantics
    (reference extract/finalize_MEDS_data.py:15-106): mandatory columns are
    cast to their canonical types and placed first; extra columns are kept
    (in their existing order) after them.
    """
    missing = [c for c in MEDS_DATA_MANDATORY_TYPES if c not in df.columns]
    if missing:
        raise ValueError(f"missing mandatory MEDS columns: {missing}")
    mandatory = [
        F.col(c).cast(t).alias(c) for c, t in MEDS_DATA_MANDATORY_TYPES.items()
    ]
    extras = additional_cols if additional_cols is not None else [
        c for c in df.columns if c not in MEDS_DATA_MANDATORY_TYPES
    ]
    return df.select(*mandatory, *[F.col(c) for c in extras])


def finalize_metadata(df: DataFrame) -> DataFrame:
    """Cast to the canonical code-metadata schema, mandatory columns first.

    Reproduces ``get_and_validate_metadata_schema``
    (reference extract/finalize_MEDS_metadata.py:28-107); absent mandatory
    columns are added as nulls (the reference adds null description /
    parent_codes when missing).
    """
    out = df
    for c, t in MEDS_METADATA_MANDATORY_TYPES.items():
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast(t))
        else:
            out = out.withColumn(c, F.col(c).cast(t))
    extras = [c for c in out.columns if c not in MEDS_METADATA_MANDATORY_TYPES]
    return out.select(*MEDS_METADATA_MANDATORY_TYPES, *extras)
