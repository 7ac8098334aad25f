"""Unit + plan tests for operators/funnel.py (windowed event funnels).

The semantics under test are definitional — max L such that a strictly
increasing chain of the first L step types exists with span <= window —
so every case here is hand-checkable. The staged-query oracle proof
(DuckDB 1/2/3-way self-join replay) lives in test_staged_queries.py.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.funnel import (
    funnel_counts,
    window_funnel,
)

STEPS = ["view", "click", "purchase"]
H = 3_600_000_000  # one hour in µs
W = 6 * H


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_type string"
    )


def _levels(spark, rows, window=W, steps=STEPS):
    out = window_funnel(_events(spark, rows), steps, window=window)
    return {r["user_id"]: r["funnel_level"] for r in out.collect()}


def test_hand_computed_levels(spark):
    rows = [
        # u1: full in-window chain -> 3
        (1, 0 * H, "view"), (1, 1 * H, "click"), (1, 2 * H, "purchase"),
        # u2: click BEFORE view, purchase with no click after the view -> 1
        (2, 0 * H, "click"), (2, 1 * H, "view"), (2, 2 * H, "purchase"),
        # u3: click 7h after the only view (outside W=6h) -> 1
        (3, 0 * H, "view"), (3, 7 * H, "click"),
        # u4: view->click ok, purchase 1µs past the span bound -> 2
        (4, 0 * H, "view"), (4, 3 * H, "click"), (4, 6 * H + 1, "purchase"),
        # u5: only a purchase (no step-1 event) -> 0
        (5, 0 * H, "purchase"),
        # u6: no step-type events at all -> absent from the output
        (6, 0 * H, "error"),
    ]
    lv = _levels(spark, rows)
    assert lv == {1: 3, 2: 1, 3: 1, 4: 2, 5: 0}


def test_tied_timestamps_never_chain(spark):
    # chain requires STRICTLY increasing ts: view and click at the same
    # instant must not form a level-2 chain (matches the oracle's ts <)
    rows = [(1, 5 * H, "view"), (1, 5 * H, "click")]
    assert _levels(spark, rows) == {1: 1}
    # ...but one microsecond later does
    rows2 = [(1, 5 * H, "view"), (1, 5 * H + 1, "click")]
    assert _levels(spark, rows2) == {1: 2}


def test_window_bound_is_inclusive(spark):
    rows = [(1, 0, "view"), (1, W, "click")]
    assert _levels(spark, rows) == {1: 2}


def test_later_restart_rescues_the_chain(spark):
    # from the first view the purchase is out of window; from the second
    # view (after which a click still occurs) it is in window -> the DP
    # must carry the LATEST viable chain start, not the first
    rows = [
        (1, 0, "view"),
        (1, 4 * H, "view"),
        (1, 5 * H + 59 * 60_000_000, "click"),
        (1, 6 * H + 30 * 60_000_000, "purchase"),
    ]
    assert _levels(spark, rows) == {1: 3}


def test_interleaved_other_steps_are_transparent(spark):
    # non-matching and out-of-order step events between chain elements
    # don't break the chain
    rows = [
        (1, 0, "view"), (1, 1, "purchase"), (1, 2, "error"),
        (1, 3, "click"), (1, 4, "view"), (1, 5, "purchase"),
    ]
    assert _levels(spark, rows) == {1: 3}


def test_timestamp_typed_input(spark):
    # timestamp-typed ts column goes through unix_micros with identical
    # semantics
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "view"),
         (1, "2024-01-01 01:00:00", "click"),
         (1, "2024-01-01 09:00:00", "purchase")],
        "user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = window_funnel(df, STEPS, window=W).collect()
    assert {r["user_id"]: r["funnel_level"] for r in out} == {1: 2}


def test_funnel_counts_spine_zero_fills(spark):
    rows = [
        (1, 0, "view"), (1, 1 * H, "click"),
        (2, 0, "view"),
        (3, 0, "click"),  # level 0, counted toward no step
    ]
    lv = window_funnel(_events(spark, rows), STEPS, window=W)
    out = {
        (r["step"], r["step_name"]): r["users"]
        for r in funnel_counts(lv, STEPS).collect()
    }
    assert out == {(1, "view"): 2, (2, "click"): 1, (3, "purchase"): 0}


def test_input_validation(spark):
    ev = _events(spark, [(1, 0, "view")])
    with pytest.raises(ValueError):
        window_funnel(ev, [], window=W)
    with pytest.raises(ValueError):
        window_funnel(ev, ["view", "view"], window=W)
    with pytest.raises(ValueError):
        window_funnel(ev, STEPS, window=-1)


def test_funnel_plan_shape(spark):
    """The 100 TB contract: the step filter reaches the parquet scan
    (row-group pruning on event_type), the whole per-user DP costs ONE
    exchange (hashpartitioning on the user column) with k-1 Window
    nodes over the same sort, the per-user aggregate reuses that
    partitioning, and nothing drops to Python."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    lv = window_funnel(ev, STEPS, window=W)
    plan = lv._sc._jvm.PythonSQLUtils.explainString(
        lv._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [In(event_type" in plan
    assert plan.count(") Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert plan.count(") Window") == len(STEPS) - 1
    assert plan.count(") Sort") == 1  # the windows share one sort order
    assert "Python" not in plan and "FlatMap" not in plan
    # strict-prefix by-value frame: ties excluded via RangeFrame to -1
    assert "RangeFrame, unboundedpreceding$(), -1" in plan


def test_funnel_counts_plan_never_touches_corpus_scale(spark):
    """funnel_counts joins a literal spine against a <=k+1-row aggregate:
    broadcast, no sort-merge join, no extra scan of the input."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    out = funnel_counts(window_funnel(ev, STEPS, window=W), STEPS)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # exactly one file scan (formatted mode names each node twice —
    # tree + detail — so count the unique Location line instead)
    assert plan.count("InMemoryFileIndex") == 1


# --- property: window_funnel == brute-force chain search -------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

settings.register_profile(
    "spark_funnel",
    deadline=None,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brute_level(evts, steps, window):
    """Reference: max L with an explicit strictly-increasing chain of
    steps[0..L-1] and span <= window — literal DFS over the definition
    (inputs are tiny)."""
    k = len(steps)
    best = 0

    def extend(i, first_ts, last_ts):
        nonlocal best
        best = max(best, i)
        if i == k:
            return
        for ts, et in evts:
            if et == steps[i] and ts > last_ts and (
                i == 0 or ts - first_ts <= window
            ):
                extend(i + 1, first_ts if i else ts, ts)

    extend(0, None, -1)
    return best


funnel_row = st.tuples(
    st.integers(1, 4),                      # user
    st.integers(0, 20),                     # ts (small grid -> many ties)
    st.sampled_from(["view", "click", "purchase", "error"]),
)


@settings(settings.get_profile("spark_funnel"))
@given(st.lists(funnel_row, min_size=1, max_size=30), st.integers(0, 12))
@pytest.mark.slow
def test_funnel_matches_bruteforce(spark, rows, window):
    from collections import defaultdict

    lv = _levels(spark, [(u, t, e) for u, t, e in rows], window=window)
    per_user = defaultdict(list)
    for u, t, e in rows:
        per_user[u].append((t, e))
    for u, evts in per_user.items():
        if not any(e in STEPS for _, e in evts):
            assert u not in lv
        else:
            assert lv[u] == _brute_level(evts, STEPS, window), (u, evts, window)
