"""Unit + plan + property tests for operators/cohorts.py (retention).

Staged-query oracle proof (DuckDB two-CTE replay over orders) lives in
test_staged_queries.py.
"""

from __future__ import annotations

import sys
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.cohorts import retention_cohorts


def _matrix(spark, rows, period="day"):
    df = spark.createDataFrame(
        [(u, f"{d} 12:00:00") for u, d in rows],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = retention_cohorts(df, period=period)
    return {
        (r["cohort"], r["period_offset"]): r["users"] for r in out.collect()
    }


def test_hand_computed_daily_matrix(spark):
    rows = [
        # u1: starts day 0, active days 0 and 2
        (1, "2024-01-01"), (1, "2024-01-03"),
        # u2: starts day 0, active day 0 only (twice -> still once)
        (2, "2024-01-01"), (2, "2024-01-01"),
        # u3: starts day 2
        (3, "2024-01-03"),
    ]
    d0 = 19723  # 2024-01-01 epoch-day
    assert _matrix(spark, rows) == {
        (d0, 0): 2, (d0, 2): 1, (d0 + 2, 0): 1,
    }


def test_weekly_offsets_count_whole_weeks(spark):
    rows = [
        (1, "2024-01-01"),  # Mon, week starts 2024-01-01
        (1, "2024-01-07"),  # Sun, SAME week -> no second row
        (1, "2024-01-08"),  # next Mon -> offset 1
        (1, "2024-01-22"),  # offset 3
    ]
    d0 = 19723
    assert _matrix(spark, rows, period="week") == {
        (d0, 0): 1, (d0, 1): 1, (d0, 3): 1,
    }


def test_monthly_offsets_are_month_arithmetic(spark):
    # Jan 31 -> Feb 1 is ONE month offset even though it's one day;
    # Jan -> Dec same year is 11 — calendar arithmetic, not day//30
    rows = [(1, "2024-01-31"), (1, "2024-02-01"), (1, "2024-12-25")]
    m0 = 2024 * 12 + 1
    assert _matrix(spark, rows, period="month") == {
        (m0, 0): 1, (m0, 1): 1, (m0, 11): 1,
    }


def test_invalid_period_raises(spark):
    df = spark.createDataFrame([(1,)], "user_id long").withColumn(
        "ts", F.current_timestamp()
    )
    with pytest.raises(ValueError):
        retention_cohorts(df, period="fortnight")


def test_cohorts_plan_shape(spark):
    """The 100 TB contract: exactly TWO exchanges (user, then the tiny
    cohort/offset key), the min+collect_set aggregate runs with map-side
    partial combine, the explode is map-side between them, and nothing
    drops to Python."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = retention_cohorts(
        orders, user_col="o_custkey", ts_col="o_orderdate", period="month"
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert plan.count(") Exchange") == 2
    assert "partial_min" in plan and "partial_collect_set" in plan
    assert ") Generate" in plan  # the explode
    assert "Join" not in plan  # the naive two-frame join never appears
    assert "Python" not in plan and "FlatMap" not in plan


# --- property: matches a brute-force reference over random activity -------

settings.register_profile(
    "spark_cohorts",
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

activity = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 40)),  # (user, day 0..40)
    min_size=1,
    max_size=30,
)


@pytest.mark.slow
@settings(settings.get_profile("spark_cohorts"))
@given(activity)
def test_cohorts_match_bruteforce(spark, rows):
    import datetime

    base = datetime.date(2024, 1, 1)
    data = [
        (u, (base + datetime.timedelta(days=d)).isoformat()) for u, d in rows
    ]
    got = _matrix(spark, data, period="day")
    base_day = 19723
    per_user = defaultdict(set)
    for u, d in rows:
        per_user[u].add(d)
    want = defaultdict(int)
    for days in per_user.values():
        c = min(days)
        for d in days:
            want[(base_day + c, d - c)] += 1
    assert got == dict(want)
