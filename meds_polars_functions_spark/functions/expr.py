"""Column-expression building blocks (SURVEY §2.2 P6-P14).

All pure ``pyspark.sql.functions`` compositions — JVM-side, codegen'd,
zero Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# P6: code construction — "//"-joined literals + columns, nulls -> "UNK"
# (reference extract/convert_to_sharded_events.py:33-98, get_code_expr)
# ---------------------------------------------------------------------------


def code_expr(parts: Sequence[str | Column], sep: str = "//") -> Column:
    """Build a MEDS code string from literal and column parts.

    Strings wrapped in ``col(...)`` (or Column objects) are treated as
    column references whose null values become ``"UNK"``; bare strings are
    literals. Mirrors the reference's code list semantics.
    """
    cols: list[Column] = []
    for p in parts:
        if isinstance(p, Column):
            cols.append(F.coalesce(p.cast("string"), F.lit("UNK")))
        elif isinstance(p, str) and p.startswith("col(") and p.endswith(")"):
            name = p[4:-1]
            cols.append(F.coalesce(F.col(name).cast("string"), F.lit("UNK")))
        else:
            cols.append(F.lit(str(p)))
    return F.concat_ws(sep, *cols)


# ---------------------------------------------------------------------------
# P7: multi-format time parsing — coalesce strptime across formats
# (reference convert_to_sharded_events.py:28-30,421-438)
# ---------------------------------------------------------------------------

#: Python strftime -> Spark (JDK DateTimeFormatter) pattern fragments.
_STRFTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%p": "a",
    "%I": "hh",
    "%%": "%",
}


def strftime_to_spark(fmt: str) -> str:
    """Translate a Python/Polars strftime pattern to a Spark datetime pattern.

    Literal text is quoted per JDK rules so e.g. ``"%m/%d/%Y, %H:%M:%S"``
    round-trips exactly.
    """
    out: list[str] = []
    i = 0
    literal: list[str] = []

    def flush_literal() -> None:
        if literal:
            text = "".join(literal)
            if any(ch.isalpha() for ch in text):
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            literal.clear()

    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            token = fmt[i : i + 2]
            if token in _STRFTIME_TO_SPARK:
                flush_literal()
                out.append(_STRFTIME_TO_SPARK[token])
                i += 2
                continue
        literal.append(fmt[i])
        i += 1
    flush_literal()
    return "".join(out)


def multi_format_time_parse(col: str | Column, formats: Sequence[str]) -> Column:
    """``coalesce(to_timestamp(c, f) for f in formats)`` with strftime input.

    Spark's ``to_timestamp`` returns null on parse failure (ANSI off),
    matching Polars' non-strict strptime; coalescing across formats
    reproduces the reference's multi-format fallback.
    """
    c = F.col(col) if isinstance(col, str) else col
    # cast-to-string first: a CSV/parquet reader may already have inferred
    # the column as TIMESTAMP (Spark CSV inference recognizes ISO-like
    # strings), and to_timestamp(timestamp, fmt) is a type error. The cast
    # is a no-op for string inputs and renders timestamps in the default
    # "yyyy-MM-dd HH:mm:ss[.SSSSSS]" form.
    s = c.cast("string")
    parsed = [F.to_timestamp(s, strftime_to_spark(f)) for f in formats]
    # Fallback: an already-timestamp column with nonzero microseconds
    # renders with a ".SSSSSS" suffix that caller format lists rarely
    # include, silently nulling every sub-second value. try_to_timestamp
    # with no format parses the default-rendered ISO forms (fractional or
    # not) and stays null for non-ISO strings, so plain-string semantics
    # are unchanged.
    parsed.append(F.try_to_timestamp(s))
    return F.coalesce(*parsed)


# ---------------------------------------------------------------------------
# P8: typed value coercion (reference convert_to_sharded_events.py:445-490)
# ---------------------------------------------------------------------------


def coerce_typed_values(
    df: DataFrame,
    numeric_value: str | None = None,
    text_value: str | None = None,
    categorical_value: str | None = None,
) -> DataFrame:
    """Non-strict typed coercion: numeric -> float (unparseable -> null),
    text/categorical -> string. Spark casts are non-strict by default,
    matching Polars ``strict=False``."""
    out = df
    if numeric_value:
        out = out.withColumn("numeric_value", F.col(numeric_value).cast("double"))
    if text_value:
        out = out.withColumn("text_value", F.col(text_value).cast("string"))
    if categorical_value:
        out = out.withColumn(
            "categorical_value", F.col(categorical_value).cast("string")
        )
    return out


# ---------------------------------------------------------------------------
# P10: fill infinite/null -> NaN (reference transforms/tokenization.py:30-56)
# ---------------------------------------------------------------------------


def fill_to_nans(col: str | Column, fill: Column | None = None) -> Column:
    """null/±inf -> NaN (or a caller-supplied fill expression — e.g. null
    for engines whose downstream can't hash NaN)."""
    c = F.col(col) if isinstance(col, str) else col
    target = fill if fill is not None else F.lit(float("nan"))
    return F.when(c.isNull() | (F.abs(c) == F.lit(float("inf"))), target).otherwise(c)


# ---------------------------------------------------------------------------
# P12/P13 support: dtype-robust epoch arithmetic.
#
# Parquet timestamps arrive as TIMESTAMP, TIMESTAMP_NTZ, or (under
# spark.sql.legacy.parquet.nanosAsLong) BIGINT depending on writer metadata
# and session conf ordering. Spark forbids TIMESTAMP_NTZ -> numeric casts
# ([DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION]) and unix_micros(NTZ), so all
# time arithmetic in this engine funnels through these helpers: NTZ ->
# TIMESTAMP is a legal, value-preserving relabel under the pinned UTC
# session zone (session.py), after which numeric casts are allowed.
# ---------------------------------------------------------------------------


def as_timestamp(col: str | Column) -> Column:
    """Coerce a time-like column (TIMESTAMP_NTZ / string / date) to a
    session-zone TIMESTAMP. Value-preserving under UTC session zone."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_seconds(col: str | Column) -> Column:
    """Seconds since epoch as DOUBLE, µs-fraction precision — the safe
    spelling of the reference's ``dt.total_microseconds()/1e6`` pattern."""
    return as_timestamp(col).cast("double")


def epoch_micros(col: str | Column) -> Column:
    """Microseconds since epoch as BIGINT (exact; preferred for joins,
    bucketing, and range predicates where double rounding above 2^53 µs
    would corrupt keys)."""
    return F.unix_micros(as_timestamp(col))


# ---------------------------------------------------------------------------
# P13: time-unit normalization (reference add_time_derived_measurements.py:105-169)
# ---------------------------------------------------------------------------

_TIME_UNITS: dict[str, tuple[tuple[str, ...], float]] = {
    # tropical year (365.2422 d = 31,556,926.08 s), NOT the Julian 365.25 —
    # the reference pins this in its normalize_time_unit doctest
    # multiplication order matters for the last ulp: 60*60*24*365.2422 =
    # 31556926.080000002 exactly as the reference's doctest pins it
    "years": (("y", "yr", "yrs", "year", "years"), 60 * 60 * 24 * 365.2422),
    "months": (("mo", "mos", "month", "months"), 30.436875 * 24 * 60 * 60),
    "weeks": (("w", "wk", "wks", "week", "weeks"), 7 * 24 * 60 * 60),
    "days": (("d", "day", "days"), 24 * 60 * 60),
    "hours": (("h", "hr", "hrs", "hour", "hours"), 60 * 60),
    "minutes": (("m", "min", "mins", "minute", "minutes"), 60.0),
    "seconds": (("s", "sec", "secs", "second", "seconds"), 1.0),
}


def normalize_time_unit(unit: str) -> tuple[str, float]:
    """alias -> (canonical unit name, seconds per unit).

    Same alias table and year/month constants as the reference
    (add_time_derived_measurements.py:105-169).
    """
    u = unit.lower()
    for canonical, (aliases, seconds) in _TIME_UNITS.items():
        if u in aliases:
            return canonical, seconds
    raise ValueError(f"unknown time unit: {unit!r}")


# ---------------------------------------------------------------------------
# Ordering / dedup / join discipline helpers (SURVEY §1.5, §2.7 U2, §3 J2)
# ---------------------------------------------------------------------------


def meds_order_window(*extra_order_cols: str | Column) -> Window:
    """Canonical MEDS per-patient window: partition by patient, order by
    time with nulls (static rows) first, then any tiebreakers.

    Spark DataFrames are unordered multisets; every order-sensitive op in
    this engine goes through an explicit window like this one
    (reference relies on Polars ``maintain_order`` instead,
    e.g. merge_to_MEDS_cohort.py:190-198)."""
    return Window.partitionBy("patient_id").orderBy(
        F.asc_nulls_first("time"), *extra_order_cols
    )


def keep_first(
    df: DataFrame, subset: Sequence[str], order_by: Sequence[str | Column]
) -> DataFrame:
    """Deterministic keep-first dedup: Polars ``unique(subset,
    maintain_order=True)`` with an explicit total order.

    ``dropDuplicates`` keeps an arbitrary row; when the reference's
    keep-first-in-order bit matters (merge_to_MEDS_cohort.py:27-31) use this
    ``row_number()==1`` form instead."""
    w = Window.partitionBy(*subset).orderBy(*order_by)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join treating null==null on every key (Polars ``join_nulls=True``,
    reference normalization.py:194-211, aggregate_code_metadata.py:531-546).

    Emits one coalesced copy of each key column. ``broadcast_right`` hints
    the dimension side — code metadata is always metadata-scale, so at
    100 TB this stays a broadcast-hash join with zero shuffle of the fact
    table."""
    # Rename right-side keys so the join works even when `right` derives
    # from `left` (self-join lineage would make bare key refs ambiguous).
    r = right
    for k in on:
        r = r.withColumnRenamed(k, f"__{k}__rk")
    if broadcast_right:
        r = F.broadcast(r)
    cond = F.lit(True)
    for k in on:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__{k}__rk"))
    joined = left.join(r, cond, how)
    keep = [F.coalesce(F.col(k), F.col(f"__{k}__rk")).alias(k) for k in on]
    left_rest = [F.col(c) for c in left.columns if c not in on]
    right_rest = [F.col(c) for c in right.columns if c not in on]
    return joined.select(*keep, *left_rest, *right_rest)


def arrow_literal_frame(spark, rows, schema):
    """Small driver-side literal DataFrame via the Arrow conversion path.

    ``spark.createDataFrame(list, schema)`` ships the rows as a pickled
    ParallelCollectionRDD whose evaluation needs a PLAIN-PICKLE Python
    worker per partition — the first query in a session to execute one
    pays the whole worker-pool spawn (measured 2-9 s of pure wait at
    local[32], round-15 profile of the PQ re-rank shortlist). The
    pandas→Arrow path converts on the driver and executes JVM-only, in
    one batch for human-scale row counts.

    Callers must pass rows free of None/NaN ambiguity in float columns
    (the Arrow converter nulls NaNs); every call site here builds plain
    finite floats/ints/strings. Falls back to the classic path if the
    Arrow converter rejects the input.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    rows = list(rows)
    try:
        pdf = pd.DataFrame.from_records(rows, columns=schema.fieldNames())
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema=schema)
