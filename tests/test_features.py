"""Rolling features and LOO target encoding vs hand/numpy computation."""

from __future__ import annotations

import pytest

from meds_polars_functions_spark.operators.features import (
    rolling_features,
    target_encode_loo,
)


def test_rolling_features_hand_values(spark):
    rows = [(1, i, float(v)) for i, v in enumerate([2, 4, 6, 8])]
    df = spark.createDataFrame(rows, ["u", "seq", "v"])
    out = {
        r["seq"]: r
        for r in rolling_features(df, "u", ["seq"], "v", window_rows=2).collect()
    }
    # seq 0: empty preceding frame
    assert out[0]["v_roll_n"] == 0 and out[0]["v_roll_mean"] is None
    assert out[0]["v_lag1"] is None
    # seq 2: frame = [2, 4]
    assert out[2]["v_roll_mean"] == pytest.approx(3.0)
    assert out[2]["v_roll_min"] == 2.0 and out[2]["v_roll_max"] == 4.0
    assert out[2]["v_roll_std"] == pytest.approx(2.0 ** 0.5, abs=1e-6)
    assert out[2]["v_lag1"] == 4.0
    # seq 3: frame = [4, 6] (window_rows=2 precedes, current excluded)
    assert out[3]["v_roll_mean"] == pytest.approx(5.0)


def test_rolling_features_no_leakage_of_current_row(spark):
    # current value is an outlier; rolling stats must not see it
    rows = [(1, 0, 1.0), (1, 1, 1.0), (1, 2, 1000.0)]
    df = spark.createDataFrame(rows, ["u", "seq", "v"])
    out = {r["seq"]: r for r in rolling_features(df, "u", ["seq"], "v", 5).collect()}
    assert out[2]["v_roll_max"] == 1.0


def test_rolling_features_keys_are_independent(spark):
    rows = [(1, 0, 10.0), (2, 1, 99.0), (1, 2, 20.0)]
    df = spark.createDataFrame(rows, ["u", "seq", "v"])
    out = {(r["u"], r["seq"]): r for r in rolling_features(df, "u", ["seq"], "v", 5).collect()}
    assert out[(1, 2)]["v_roll_mean"] == 10.0  # never sees user 2's 99
    assert out[(2, 1)]["v_roll_n"] == 0


def test_target_encode_loo_hand_values(spark):
    rows = [(0, "a", 1.0), (1, "a", 3.0), (2, "b", 10.0)]
    df = spark.createDataFrame(rows, ["id", "cat", "y"])
    m = 2.0
    gm = (1.0 + 3.0 + 10.0) / 3
    out = {r["id"]: r["cat_te"] for r in target_encode_loo(df, "cat", "y", smoothing=m).collect()}
    # row 0 (cat a): (4 - 1 + m*gm) / (2 - 1 + m)
    assert out[0] == pytest.approx((4.0 - 1.0 + m * gm) / (1 + m), abs=1e-6)
    assert out[1] == pytest.approx((4.0 - 3.0 + m * gm) / (1 + m), abs=1e-6)
    # singleton cat b: (10 - 10 + m*gm) / (0 + m) = gm exactly
    assert out[2] == pytest.approx(gm, abs=1e-6)


@pytest.mark.slow
def test_target_encode_is_row_order_independent(spark):
    rows = [(i, f"c{i % 5}", float((i * 13) % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "cat", "y"])
    a = sorted(map(tuple, target_encode_loo(df.repartition(11), "cat", "y").collect()))
    b = sorted(map(tuple, target_encode_loo(df.coalesce(1), "cat", "y").collect()))
    assert a == b
