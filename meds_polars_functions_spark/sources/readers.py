"""Sources (SURVEY §2.1 S1-S5).

Parquet / CSV / gzip-CSV scans with the reference's format-priority
resolution (reference extract/utils.py:41-131) and the row-index attach
(shard_events.py:50-162). Spark reads ``.csv.gz`` transparently and does
sampled schema inference natively, so S2/S3 collapse into reader options.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Priority order mirrors reference extract/utils.py:13-35.
FORMAT_PRIORITY = (".parquet", ".csv.gz", ".csv")


def resolve_input_path(prefix: str) -> str:
    """Given a path prefix, pick the highest-priority existing file
    (``.parquet`` > ``.csv.gz`` > ``.csv``), reference extract/utils.py:41-131."""
    for suffix in FORMAT_PRIORITY:
        candidate = prefix + suffix
        if os.path.exists(candidate):
            return candidate
    raise FileNotFoundError(f"no input found for prefix {prefix!r} among {FORMAT_PRIORITY}")


def read_table(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    infer_schema_length: int | None = 10_000,
) -> DataFrame:
    """Read parquet/csv/csv.gz by extension; optionally prune columns.

    Column pruning here (reference shard_events.py:165-264 does it manually)
    is mostly cosmetic on parquet — Catalyst prunes at the scan — but on CSV
    it avoids inferring types for unused columns.
    """
    if path.endswith(".parquet"):
        df = spark.read.parquet(path)
    elif path.endswith((".csv", ".csv.gz")):
        reader = spark.read.option("header", "true")
        if infer_schema_length:
            # Spark samples by ratio, not row count; a generous ratio plays
            # the role of the reference's infer_schema_length=10k.
            reader = reader.option("inferSchema", "true")
        df = reader.csv(path)
    else:
        # No extension: resolve by priority.
        return read_table(spark, resolve_input_path(path), columns, infer_schema_length)
    if columns:
        df = df.select(*[c for c in columns if c in df.columns])
    return df


def normalize_time_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Make timestamp-like columns session-zone TIMESTAMPs, whatever the
    parquet writer produced.

    Three arrival shapes exist for the same physical column (SURVEY §1.3;
    reference extract/__init__.py:16-21 pins naive µs timestamps):

    - ``TIMESTAMP``: already canonical — untouched.
    - ``TIMESTAMP_NTZ`` (parquet ``isAdjustedToUTC=false``): relabeled via a
      value-preserving NTZ->TIMESTAMP cast under the pinned UTC session zone.
      Spark forbids NTZ->numeric casts and ``unix_micros(NTZ)``, so leaving
      NTZ in the plan poisons all downstream epoch arithmetic.
    - ``BIGINT`` (``spark.sql.legacy.parquet.nanosAsLong`` with TIMESTAMP(NANOS)
      files): nanoseconds -> µs-precision timestamp via integer division
      (double division loses precision above 2^53 ns).

    ``columns=None`` scans every column; dtype dispatch (not conf state)
    decides the conversion, so the result is independent of when session
    confs landed relative to relation resolution.
    """
    targets = columns or [c for c, _ in df.dtypes]
    dtypes = dict(df.dtypes)
    for c in targets:
        dt = dtypes.get(c)
        if dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif dt == "bigint" and columns is not None:
            # Only convert BIGINT when the caller names the column — a bare
            # integer column is not inherently a timestamp.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def with_row_index(
    df: DataFrame, name: str = "__row_idx__", order_by: list[str] | None = None
) -> DataFrame:
    """Attach a row index (reference shard_events.py:50-162 scan_with_row_idx).

    With ``order_by``: a deterministic dense index via ``row_number`` over a
    global window — only for metadata-scale frames (single-partition
    window). Without: ``monotonically_increasing_id`` — distributed, sparse,
    stable-within-partition; the right choice when the index only needs to
    be a reorderable handle (the reference's dominant use: restore row order
    after a join, filter_measurements.py:127-137)."""
    if order_by:
        w = Window.orderBy(*order_by)
        return df.withColumn(name, F.row_number().over(w) - F.lit(1))
    return df.withColumn(name, F.monotonically_increasing_id())


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
) -> DataFrame:
    """JSON-Lines dataset reader — the de-facto interchange format of
    LLM training corpora (one document object per line, gzip-splittable
    per file). Beyond-reference source (the reference reads
    parquet/csv only).

    At 100 TB ALWAYS pass ``schema`` (a StructType or DDL string):
    without it Spark runs a full inference pre-pass over every byte of
    input before the real scan — doubling the most expensive stage of
    the job. With a schema the scan is single-pass, malformed lines go
    to ``_corrupt_record`` (PERMISSIVE mode) instead of failing the
    job, and column pruning still reaches the parser."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
