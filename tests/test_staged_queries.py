"""Oracle-grade local proof for STAGED queries — implemented operators
whose queries()/oracle_sql() registration waits on the round-6 registry
rotation (the registry is FROZEN at 165 until the driver-grade debt is
cleared; VERDICT r4 item 4, COVERAGE.md rotation plan).

Holds every staged query to the SAME strict comparator the round-window
sweep uses (scripts/compare_oracle._normalize — int 1 != float 1.0, the
round-4 red-row class), plus the dtype-parity scan, so registration later
is a rename, not a re-verification.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from scripts.compare_oracle import _normalize

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_staged_names_not_registered():
    # the freeze: staging must not leak into the frozen 165-query registry
    registered = set(entry.queries())
    assert not registered & set(entry.staged_queries())


def test_kneser_ney_lm_matches_oracle_strict(spark, con):
    sdf = entry.staged_queries()["kneser_ney_lm"](spark, SF_DIR).toPandas()
    odf = con.execute(entry.staged_oracle_sql()["kneser_ney_lm"]).fetchdf()
    scols, srows = _normalize(sdf)
    ocols, orows = _normalize(odf)
    assert scols == ocols
    assert len(srows) == len(orows) > 0
    assert srows == orows
    # dtype parity (the round-4 red-row class): no int-vs-float skew
    assert [str(t) for t in sdf[sorted(sdf.columns)].dtypes] == [
        str(t) for t in odf[sorted(odf.columns)].dtypes
    ]


def test_kmeans_cells_rows_only_contract(spark):
    # iterative algorithm — registered as rows-only (no SQL oracle can
    # replay the distributed float-sum order); assert the weaker contract
    # the driver will check: stable schema, deterministic rows, full
    # coverage of the input
    out1 = entry.staged_queries()["kmeans_cells"](spark, SF_DIR)
    rows1 = out1.collect()
    rows2 = entry.staged_queries()["kmeans_cells"](spark, SF_DIR).collect()
    assert [f.name for f in out1.schema.fields] == ["cell", "n"]
    assert rows1 == rows2  # seeded init + deterministic argmin
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n"] for r in rows1) == n_vecs
    assert 1 <= len(rows1) <= 4
