"""Grouped OLS / Markov transitions / co-occurrence PMI vs numpy."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.stats import (
    code_cooccurrence_pmi,
    event_transitions,
    grouped_ols_trend,
)


def test_grouped_ols_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(3)
    rows = []
    for g, (slope, icept) in {"a": (2.5, 1.0), "b": (-0.5, 4.0)}.items():
        xs = rng.uniform(0, 10, 50)
        ys = slope * xs + icept + rng.normal(0, 0.1, 50)
        rows += [(g, float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r["g"]: r for r in grouped_ols_trend(df, ["g"], "x", "y").collect()}
    for g in ("a", "b"):
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys = np.array([y for gg, _, y in rows if gg == g])
        b, a = np.polyfit(xs, ys, 1)
        assert got[g]["slope"] == pytest.approx(b, abs=1e-5)
        assert got[g]["intercept"] == pytest.approx(a, abs=1e-5)
        r = np.corrcoef(xs, ys)[0, 1]
        assert got[g]["r2"] == pytest.approx(r * r, abs=1e-5)
        assert got[g]["n"] == 50


def test_grouped_ols_zero_variance_x_is_null(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 1.0, 5.0), ("g", 1.0, 9.0)], ["g", "x", "y"]
    )
    row = grouped_ols_trend(df, ["g"], "x", "y").collect()[0]
    assert row["slope"] is None and row["intercept"] is None and row["r2"] is None


def test_grouped_ols_stats_are_mergeable(spark):
    """Sufficient statistics are additive: OLS over the union equals
    OLS over summed shard statistics (here: just equality of the
    operator over a reshuffled input — order independence)."""
    rows = [("g", float(i), float(3 * i + 1 + (i % 5) * 0.01)) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    a = grouped_ols_trend(df.repartition(13), ["g"], "x", "y").collect()[0]
    b = grouped_ols_trend(df.coalesce(1), ["g"], "x", "y").collect()[0]
    assert a == b


def test_event_transitions_hand_chain(spark):
    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "B"),
        (2, 1, "A"), (2, 2, "B"),
    ]
    df = spark.createDataFrame(rows, ["user", "seq", "state"])
    got = {
        (r["prev_state"], r["next_state"]): (r["n"], r["p"])
        for r in event_transitions(df, "user", ["seq"], "state").collect()
    }
    # A->B three times (p=1.0 from A), B->A once (p=1.0 from B)
    assert got[("A", "B")] == (3, 1.0)
    assert got[("B", "A")] == (1, 1.0)
    assert len(got) == 2


def test_code_pmi_hand_counts(spark):
    # baskets: {A,B}, {A,B}, {A,C}, {B} (dropped: <2 items)
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r["item_a"], r["item_b"]): (r["n_pair"], r["pmi"])
        for r in code_cooccurrence_pmi(df, ["basket"], "item").collect()
    }
    # 3 qualifying baskets; A in 3, B in 2, C in 1
    assert got[("A", "B")][0] == 2
    assert got[("A", "B")][1] == pytest.approx(math.log2(2 * 3 / (3 * 2)), abs=1e-6)
    assert got[("A", "C")][0] == 1
    assert got[("A", "C")][1] == pytest.approx(math.log2(1 * 3 / (3 * 1)), abs=1e-6)
    assert ("B", "C") not in got


def test_code_pmi_dedups_within_basket(spark):
    # repeated (basket, item) rows must not inflate counts
    rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r["item_a"], r["item_b"]): r["n_pair"]
        for r in code_cooccurrence_pmi(df, ["basket"], "item").collect()
    }
    assert got[("A", "B")] == 2


def test_welch_ttest_matches_numpy(spark):
    from meds_polars_functions_spark.operators.stats import grouped_welch_ttest

    rng = np.random.default_rng(5)
    a = rng.normal(10.0, 2.0, 40)
    b = rng.normal(11.0, 3.0, 60)
    rows = [("s", "A", float(v)) for v in a] + [("s", "B", float(v)) for v in b]
    df = spark.createDataFrame(rows, ["stratum", "grp", "v"])
    row = grouped_welch_ttest(df, ["stratum"], "grp", "v", "A", "B").collect()[0]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2**2 / ((va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1))
    assert row["n_a"] == 40 and row["n_b"] == 60
    assert row["mean_a"] == pytest.approx(a.mean(), abs=1e-6)
    assert row["t"] == pytest.approx(t, abs=1e-5)
    assert row["df"] == pytest.approx(dof, abs=1e-4)


def test_welch_ttest_degenerate_guards(spark):
    from meds_polars_functions_spark.operators.stats import grouped_welch_ttest

    rows = [("s", "A", 1.0), ("s", "B", 2.0), ("s", "B", 3.0)]  # n_a = 1
    df = spark.createDataFrame(rows, ["stratum", "grp", "v"])
    row = grouped_welch_ttest(df, ["stratum"], "grp", "v", "A", "B").collect()[0]
    assert row["t"] is None and row["df"] is None
    # zero variance on both sides -> se2 = 0 -> null
    rows2 = [("s", "A", 5.0)] * 3 + [("s", "B", 7.0)] * 3
    df2 = spark.createDataFrame(rows2, ["stratum", "grp", "v"])
    row2 = grouped_welch_ttest(df2, ["stratum"], "grp", "v", "A", "B").collect()[0]
    assert row2["t"] is None


def test_correlation_matrix_matches_numpy(spark):
    from meds_polars_functions_spark.operators.stats import correlation_matrix

    rng = np.random.default_rng(9)
    x = rng.normal(size=200)
    y = 0.7 * x + rng.normal(scale=0.5, size=200)
    z = rng.normal(size=200)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, ["x", "y", "z"]).repartition(7)
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    want = np.corrcoef(np.stack([x, y, z]))
    assert got[("x", "y")] == pytest.approx(want[0, 1], abs=1e-5)
    assert got[("x", "z")] == pytest.approx(want[0, 2], abs=1e-5)
    assert got[("y", "z")] == pytest.approx(want[1, 2], abs=1e-5)
    assert len(got) == 3


def test_correlation_matrix_zero_variance_and_null_rows(spark):
    from meds_polars_functions_spark.operators.stats import correlation_matrix

    rows = [(1.0, 5.0, 1.0), (2.0, 5.0, 4.0), (3.0, 5.0, None)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {(r["col_a"], r["col_b"]): (r["n"], r["corr"]) for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
    # complete-case: the null-c row drops everywhere -> n = 2
    assert all(n == 2 for n, _ in got.values())
    # b is constant -> null corr against anything
    assert got[("a", "b")][1] is None and got[("b", "c")][1] is None
    # a,c perfectly correlated on the 2 remaining rows
    assert got[("a", "c")][1] == pytest.approx(1.0, abs=1e-6)


def test_chi_square_hand_2x2(spark):
    from meds_polars_functions_spark.operators.stats import chi_square_independence

    # classic 2x2: a=[10,20], b=[30,40]
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20 + [("y", "p")] * 30 + [("y", "q")] * 40
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    row = chi_square_independence(df, "a", "b").collect()[0]
    o = np.array([[10, 20], [30, 40]], dtype=float)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = float((((o - e) ** 2) / e).sum())
    assert row["n"] == 100 and row["dof"] == 1
    assert row["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert row["cramers_v"] == pytest.approx(math.sqrt(chi2 / 100), abs=1e-5)


def test_chi_square_zero_observed_cells_counted(spark):
    from meds_polars_functions_spark.operators.stats import chi_square_independence

    # (y, q) never observed — its expected count must still contribute
    rows = [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 10
    df = spark.createDataFrame(rows, ["a", "b"])
    row = chi_square_independence(df, "a", "b").collect()[0]
    o = np.array([[5, 5], [10, 0]], dtype=float)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = float((((o - e) ** 2) / e).sum())
    assert row["chi2"] == pytest.approx(chi2, abs=1e-5)


def test_chi_square_independent_columns_near_zero(spark):
    from meds_polars_functions_spark.operators.stats import chi_square_independence

    # perfectly independent layout: every (a, b) cell equal
    rows = [(f"a{i}", f"b{j}") for i in range(3) for j in range(4) for _ in range(5)]
    df = spark.createDataFrame(rows, ["a", "b"])
    row = chi_square_independence(df, "a", "b").collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert row["dof"] == 6
