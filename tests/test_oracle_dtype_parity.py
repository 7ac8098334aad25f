"""Dtype-parity scan over ALL registered oracles — the round-4 red-row
class, caught statically.

Round 4's two driver reds (novelty_score, chi_square) were value-identical
results whose HASHES diverged: DuckDB promotes integer sums to HUGEINT,
which pandas materializes as float64 (``1.0``), while Spark returns int64
(``1``) — and the driver's value hash distinguishes them. The local sweep's
old ``_norm_val`` normalized int==float, so three 165/165 local sweeps
coexisted with two driver reds (VERDICT r4 "What's wrong" #1).

This test reproduces the judge's scan as a permanent gate: for every
registered query, compare the Spark RESULT SCHEMA (Catalyst analysis only —
no Spark execution beyond queries that materialize driver-side state at
build time) against the pandas dtypes of the DuckDB oracle result at
sf0.001, and fail on any column where one engine would hand the driver an
integer dtype and the other a float dtype.

A nullable integer column that CONTAINS nulls reaches pandas as float64 on
both engines, so it passes at the driver — but only while the nulls last.
Two queries rely on that and are allow-listed because their nulls are
STRUCTURAL (guaranteed by query shape, not data):

- ``scd2_priority.to_us``   — lead() over the last interval per customer
  is always NULL (every customer contributes one).
- ``union_by_name.event_id`` — one UNION branch is a NULL literal.

For both, this test additionally asserts the oracle result really does
contain nulls, so a semantic edit that breaks the structural-null property
fails here before the driver sees a red row. Data-DEPENDENT nullable cases
must instead be pinned by casting to DOUBLE on both sides, as
``asof_purchase_click.click_id/click_us`` were in round 5.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# (query, column) pairs allowed to be Spark-int / DuckDB-float because the
# column is nullable with STRUCTURALLY guaranteed nulls (see module doc).
STRUCTURAL_NULL_ALLOW = {
    ("scd2_priority", "to_us"),
    ("union_by_name", "event_id"),
}


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "float"  # both engines reach pandas as a fractional value
    return "other"


def _pandas_kind(dtype) -> str:
    k = dtype.kind  # numpy kind char
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return "other"


# Fast-path subset (round 16): the full 184-oracle sweep costs ~8 min and
# is gated behind --runslow; the default gate re-checks the queries where
# this class of skew has actually occurred or is structurally likeliest —
# the two round-4 reds, the structural-null allow-list, the round-5
# explicit-cast pin, plus one representative per integer-aggregate family.
# The external driver's oracle gate still hashes every registered query.
FAST_SUBSET = [
    "novelty_score",       # round-4 red: DuckDB HUGEINT sum -> float64
    "chi_square",          # round-4 red, same class
    "scd2_priority",       # structural-null allow-list entry
    "union_by_name",       # structural-null allow-list entry
    "asof_purchase_click", # round-5 explicit DOUBLE cast pin
    "pricing_summary",     # mixed sum/avg/count aggregate block
    "agg_code_metadata",   # count/min/max integer aggregates
    "monthly_retention",   # int counts + float ratio
    "hll_user_overlap",    # sketch estimates: int-ish doubles
    "logreg_step",         # float weights + int count
    "bigram_lm",           # LM logp doubles + int token ids
    "interpolate_values",  # interpolation: float from int neighbors
]


def _dtype_parity_scan(spark, names=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    violations: dict[str, list[str]] = {}
    allow_seen: set[tuple[str, str]] = set()

    for name, fn in qs.items():
        if name not in oracles:
            continue  # rows-only queries have no oracle to skew against
        if names is not None and name not in names:
            continue
        schema = {f.name: _spark_kind(f.dataType) for f in fn(spark, SF_DIR).schema.fields}
        odf = con.execute(oracles[name]).df()
        for col in odf.columns:
            sk = schema.get(col)
            if sk is None:
                continue  # column-name parity is the sweep's job, not ours
            dk = _pandas_kind(odf[col].dtype)
            if {sk, dk} == {"int", "float"}:
                if (name, col) in STRUCTURAL_NULL_ALLOW:
                    allow_seen.add((name, col))
                    assert odf[col].isna().any(), (
                        f"{name}.{col} is allow-listed as structurally null "
                        f"but the oracle result has no nulls — the dtype pin "
                        f"no longer holds; cast both sides explicitly instead"
                    )
                else:
                    violations.setdefault(name, []).append(
                        f"{col}: spark={sk} duckdb={dk}({odf[col].dtype})"
                    )

    assert not violations, (
        "int-vs-float dtype skew between Spark schema and DuckDB oracle "
        f"result (driver hash-red class): {violations}"
    )
    return allow_seen


def test_fast_subset_dtype_parity(spark):
    """Default-path representative of the full sweep (see FAST_SUBSET)."""
    allow_seen = _dtype_parity_scan(spark, names=set(FAST_SUBSET))
    # both allow-list queries are in the subset, so staleness is still
    # checked on the fast path
    stale = STRUCTURAL_NULL_ALLOW - allow_seen
    assert not stale, f"allow-list entries never exercised: {stale}"


@pytest.mark.slow
def test_all_oracles_dtype_parity(spark):
    allow_seen = _dtype_parity_scan(spark)
    # stale allow-list entries are themselves a defect: they would mask a
    # future real skew on that column
    stale = STRUCTURAL_NULL_ALLOW - allow_seen
    assert not stale, f"allow-list entries never exercised: {stale}"
