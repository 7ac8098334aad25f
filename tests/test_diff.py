"""Keyed snapshot diff classification."""

from __future__ import annotations

from meds_polars_functions_spark.functions.diff import table_diff


def test_table_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, "c", None), (5, "e", 5.0)],
        ["k", "s", "v"],
    )
    got = {r["k"]: r["diff_status"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # null == null is NOT a change
        4: "removed",
        5: "added",
    }
