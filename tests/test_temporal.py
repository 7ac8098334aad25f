"""Temporal joins (operators/temporal.py): as-of join semantics
(direction / strictness / tolerance / unmatched keys), bucketed range
join vs a naive inequality join, and the bloom prefilter's
no-false-negatives contract — plus plan-shape checks that the range
join stays an equi-join (never BroadcastNestedLoopJoin / cartesian,
the plans Spark picks for raw inequality joins)."""

from __future__ import annotations

import datetime as dt
import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.temporal import (
    asof_join,
    bloom_prefilter,
    locf_impute,
    range_join,
    resample_last,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "l10"),
            (1, _ts(20), "l20"),
            (2, _ts(5), "l5"),
            (3, _ts(100), "l100"),  # key with no right rows
        ],
        "key long, t timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), "r10"),  # tie with left t=10
            (1, _ts(15), "r15"),
            (1, _ts(30), "r30"),
            (2, _ts(7), "r7"),
        ],
        "key long, t timestamp, rval string",
    )
    return left, right


def _matches(df):
    rows = df.orderBy("key", "t").collect()
    return [(r.key, r.lval, r.rval_right) for r in rows]


def test_asof_backward_nonstrict_takes_ties(sides):
    left, right = sides
    out = asof_join(left, right, ["key"], "t", "t", ["rval"])
    assert _matches(out) == [
        (1, "l10", "r10"),  # tie visible
        (1, "l20", "r15"),
        (2, "l5", None),  # nothing at-or-before
        (3, "l100", None),  # key absent from right
    ]


def test_asof_backward_strict_excludes_ties(sides):
    left, right = sides
    out = asof_join(left, right, ["key"], "t", "t", ["rval"], strict=True)
    assert _matches(out) == [
        (1, "l10", None),  # tie excluded, nothing strictly before
        (1, "l20", "r15"),
        (2, "l5", None),
        (3, "l100", None),
    ]


def test_asof_forward(sides):
    left, right = sides
    out = asof_join(left, right, ["key"], "t", "t", ["rval"], direction="forward")
    assert _matches(out) == [
        (1, "l10", "r10"),
        (1, "l20", "r30"),
        (2, "l5", "r7"),
        (3, "l100", None),
    ]
    strict = asof_join(
        left, right, ["key"], "t", "t", ["rval"], direction="forward", strict=True
    )
    assert _matches(strict)[0] == (1, "l10", "r15")


def test_asof_tolerance_nulls_far_matches(sides):
    left, right = sides
    out = asof_join(
        left, right, ["key"], "t", "t", ["rval"], tolerance_us=4_000_000
    )
    # l20's nearest prior is r15, 5 s away — outside the 4 s tolerance.
    assert _matches(out) == [
        (1, "l10", "r10"),
        (1, "l20", None),
        (2, "l5", None),
        (3, "l100", None),
    ]


def test_asof_preserves_left_rowcount_and_columns(sides):
    left, right = sides
    out = asof_join(left, right, ["key"], "t", "t", ["rval"])
    assert out.count() == left.count()
    assert out.columns == ["key", "t", "lval", "t_right", "rval_right"]


def test_range_join_matches_naive_inequality_join(spark):
    # Dtype-dispatched normalization (readers.normalize_time_columns):
    # depending on when nanosAsLong lands relative to relation resolution,
    # ts arrives as BIGINT nanos, TIMESTAMP_NTZ, or TIMESTAMP.
    from meds_polars_functions_spark.sources.readers import normalize_time_columns

    ev = normalize_time_columns(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"), ["ts"]
    ).select("event_id", "user_id", "ts")
    a = ev.withColumnRenamed("event_id", "a_id")
    b = ev.withColumnRenamed("event_id", "b_id")
    lo, hi = 1, 7_200_000_000  # (0, 2h] — excludes self-pairs
    got = range_join(a, b, ["user_id"], "ts", "ts", lo, hi).select(
        "a_id", F.col("b_id_right").alias("b_id")
    )
    naive = (
        a.join(b.withColumnRenamed("ts", "ts_b"), "user_id")
        .filter(
            (F.unix_micros("ts_b") - F.unix_micros("ts")).between(lo, hi)
        )
        .select("a_id", "b_id")
    )
    assert got.count() > 0
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_asof_plan_has_single_exchange(spark, sides):
    left, right = sides
    out = asof_join(left, right, ["key"], "t", "t", ["rval"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # union + running window: ONE hash exchange on the key, no join at all
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning(key" in plan
    assert "Join" not in plan


def test_range_join_plan_is_equi_join(spark, sides):
    left, right = sides
    out = range_join(left, right, ["key"], "t", "t", 0, 10_000_000)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_prefilter_no_false_negatives(spark):
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    build = spark.range(0, 20000, 7).select(F.col("id").alias("b"))
    pre = bloom_prefilter(probe, "k", build, "b", num_bits=1 << 18)
    kept = {r.k for r in pre.collect()}
    true_keys = {r.b for r in build.collect()}
    assert true_keys <= kept  # every real match survives
    # false-positive rate stays small at ~14 bits/key
    assert len(kept) < 20000 * 0.25
    # prefilter + exact join ≡ exact join
    sem = build.withColumnRenamed("b", "k")
    assert (
        pre.join(sem, "k", "left_semi").count()
        == probe.join(sem, "k", "left_semi").count()
    )


def test_locf_impute_fills_forward_only(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1), 1, 10.0),
            (1, _ts(2), 2, None),  # <- fills from t=1
            (1, _ts(3), 3, 30.0),
            (1, _ts(3), 4, None),  # tie: event 4 after event 3 -> 30.0
            (2, None, 6, 7.0),  # static row sorts first (nulls first)
            (2, _ts(1), 5, None),  # inherits the static baseline
            (2, _ts(9), 7, None),  # still the static value
            (3, _ts(1), 8, None),  # nothing before -> stays null
        ],
        "pid long, t timestamp, eid long, v double",
    )
    out = locf_impute(df, ["pid"], "t", "v", tie_cols=["eid"])
    got = {r.eid: r.v for r in out.collect()}
    assert got == {1: 10.0, 2: 10.0, 3: 30.0, 4: 30.0, 5: 7.0, 6: 7.0, 7: 7.0, 8: None}


def test_resample_last_keeps_latest_per_bucket(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(10), 1, 1.0),
            (1, _ts(50), 2, 2.0),  # same 60s bucket -> wins over eid 1
            (1, _ts(70), 3, 3.0),  # next bucket
            (1, _ts(70), 4, 4.0),  # tie: higher eid wins
            (2, _ts(0), 5, 5.0),
        ],
        "key long, t timestamp, eid long, v double",
    )
    out = resample_last(df, ["key"], "t", 60_000_000, tie_cols=["eid"])
    rows = out.collect()
    assert {r.eid for r in rows} == {2, 4, 5}
    # bucket_start is grid-aligned
    assert all(
        r.bucket_start.second == 0 and r.bucket_start.microsecond == 0
        for r in rows
    )


def test_bloom_prefilter_on_strings(spark):
    probe = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "s string"
    )
    build = spark.createDataFrame([("b",), ("d",), ("zz",)], "s2 string")
    kept = {r.s for r in bloom_prefilter(probe, "s", build, "s2").collect()}
    assert {"b", "d"} <= kept


def test_streaks_islands(spark):
    import datetime as dt

    from meds_polars_functions_spark.operators.temporal import streaks

    d = dt.datetime
    rows = [
        # user 1: days 1,2,3 then 7,8  -> streaks 3 and 2
        (1, d(2024, 1, 1, 5)), (1, d(2024, 1, 1, 9)), (1, d(2024, 1, 2)),
        (1, d(2024, 1, 3)), (1, d(2024, 1, 7)), (1, d(2024, 1, 8)),
        # user 2: single day -> streak 1
        (2, d(2024, 1, 5)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["user_id"], r["streak_start"].day, r["streak_len"])
        for r in streaks(df, ["user_id"], "ts").collect()
    }
    assert got == {(1, 1, 3), (1, 7, 2), (2, 5, 1)}


def test_resample_interpolate_linear_and_edges(spark):
    import datetime as dt

    from meds_polars_functions_spark.operators.temporal import resample_interpolate

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # key 1: obs at 10s->10.0 and 100s->100.0
        (1, base + dt.timedelta(seconds=10), 10.0, 1),
        (1, base + dt.timedelta(seconds=100), 100.0, 2),
        # key 2: single obs exactly on a grid point
        (2, base + dt.timedelta(seconds=30), 5.0, 3),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "eid"])
    out = resample_interpolate(
        df, ["k"], "ts", "v", step_seconds=30, tie_cols=["eid"]
    )
    got = {
        (r["k"], int(r["grid_time"].timestamp()) % 86400): (
            None if r["interp_value"] is None else round(r["interp_value"], 9)
        )
        for r in out.collect()
    }
    # key 1 grid: 0s (before first obs -> null), 30,60,90 interpolated
    assert got[(1, 0)] is None
    assert got[(1, 30)] == round(10 + 90 * (20 / 90), 9)
    assert got[(1, 60)] == round(10 + 90 * (50 / 90), 9)
    assert got[(1, 90)] == round(10 + 90 * (80 / 90), 9)
    # key 2: exact hit -> its own value, single grid point
    assert got[(2, 30)] == 5.0
    assert len([k for k in got if k[0] == 2]) == 1


def test_scd2_intervals_collapse_and_bounds(spark):
    import datetime as dt

    from meds_polars_functions_spark.operators.temporal import scd2_intervals

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1), "A", 1),
        (1, d(2024, 1, 2), "A", 2),   # no change -> merges
        (1, d(2024, 1, 3), "B", 3),   # change
        (1, d(2024, 1, 4), "A", 4),   # back to A -> NEW interval
        (2, d(2024, 1, 1), None, 5),
        (2, d(2024, 1, 2), None, 6),  # null == null -> merges
        (2, d(2024, 1, 3), "C", 7),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "eid"])
    out = scd2_intervals(df, ["k"], "ts", ["v"], tie_cols=["eid"])
    got = {
        (r["k"], r["v"], r["valid_from"].day,
         None if r["valid_to"] is None else r["valid_to"].day)
        for r in out.collect()
    }
    assert got == {
        (1, "A", 1, 3), (1, "A", 4, None), (1, "B", 3, 4),
        (2, None, 1, 3), (2, "C", 3, None),
    }
