"""Registration-grade proofs for the approx-percentile profile family
(operators/profiles.py; staged round 12 as q_approx_percentile_profile).

The sketch's interior answers are engine-specific, so correctness is
held by INVARIANTS (the kmeans_cells precedent): p0/p100 exactness,
coverage counts, and the GK rank-guarantee window — plus a
falsifiability proof that the window BINDS (a swapped answer flips it)
and a plan pin of the 100 TB shape (one mergeable-sketch exchange, a
broadcast verification join, zero Python nodes).
"""

from __future__ import annotations

import io
import random
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.profiles import (
    _exact_rank_interval,
    _gk_window,
    approx_percentile_profile,
    verify_percentile_profile,
)

PS = [0.0, 0.5, 0.9, 0.99, 1.0]
ACC = 100


@pytest.fixture(scope="module")
def fuzz_df(spark):
    """Seeded, skewed, tie-heavy: 3 groups x (800/2500/60) rows, values
    drawn from a mix of a lognormal-ish tail and a duplicated plateau
    (exercises the tie interval [cnt_lt+1, cnt_le])."""
    rng = random.Random(42)
    rows = []
    for g, n in (("a", 800), ("b", 2500), ("c", 60)):
        for _ in range(n):
            if rng.random() < 0.3:
                v = 5.0  # plateau: massive ties
            else:
                v = round(rng.random() ** 4 * 1000, 2)
            rows.append((g, v))
    rows += [("a", None)] * 25  # nulls must not count
    return spark.createDataFrame(rows, "g string, v double")


@pytest.mark.slow
def test_p0_p100_exact_and_rank_windows_hold(spark, fuzz_df):
    prof = approx_percentile_profile(fuzz_df, "v", ["g"], PS, accuracy=ACC)
    ver = verify_percentile_profile(
        fuzz_df, prof, "v", ["g"], accuracy=ACC
    ).collect()
    data = {}
    for g, v in fuzz_df.collect():
        if v is not None:
            data.setdefault(g, []).append(v)
    assert {r["g"] for r in ver} == set(data)
    for r in ver:
        vals = data[r["g"]]
        assert r["n"] == len(vals)  # nulls excluded from coverage
        if r["percentile"] == 0.0:
            assert r["approx_value"] == min(vals)  # GK keeps the min
        if r["percentile"] == 1.0:
            assert r["approx_value"] == max(vals)  # ... and the max
        # the Spark-side rank check agrees with a driver-side replay
        lo_r, hi_r = _exact_rank_interval(vals, r["approx_value"])
        assert (r["cnt_lt"] + 1, r["cnt_le"]) == (lo_r, hi_r)
        w_lo, w_hi = _gk_window(r["percentile"], len(vals), ACC)
        assert r["rank_ok"] == (lo_r <= w_hi and hi_r >= w_lo)
        assert r["rank_ok"]  # a correct sketch never violates it


def test_rank_window_binds_on_swapped_answers(spark, fuzz_df):
    """Falsifiability: hand p99's answer to the p50 row (and vice
    versa) — every swapped row must flip rank_ok to False, i.e. the
    invariant window is narrow enough to catch a sketch that returns a
    value from the wrong end of the distribution."""
    prof = approx_percentile_profile(fuzz_df, "v", ["g"], PS, accuracy=ACC)
    rows = prof.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], {})[r["percentile"]] = r["approx_value"]
    swapped = [
        (
            r["g"],
            r["percentile"],
            r["n"],
            by_g[r["g"]][{0.5: 0.99, 0.99: 0.5}.get(r["percentile"], r["percentile"])],
        )
        for r in rows
    ]
    bad = spark.createDataFrame(
        swapped, "g string, percentile double, n long, approx_value double"
    )
    ver = verify_percentile_profile(fuzz_df, bad, "v", ["g"], accuracy=ACC)
    got = {(r["g"], r["percentile"]): r["rank_ok"] for r in ver.collect()}
    for g in by_g:
        assert got[(g, 0.5)] is False  # p99's value fails p50's window
        assert got[(g, 0.99)] is False  # and vice versa
        assert got[(g, 0.0)] is True  # untouched rows still pass
        assert got[(g, 1.0)] is True


def test_invalid_args_raise(spark, fuzz_df):
    with pytest.raises(ValueError):
        approx_percentile_profile(fuzz_df, "v", ["g"], [], accuracy=ACC)
    with pytest.raises(ValueError):
        approx_percentile_profile(fuzz_df, "v", ["g"], [1.5], accuracy=ACC)
    with pytest.raises(ValueError):
        approx_percentile_profile(fuzz_df, "v", ["g"], [0.5, 0.5], accuracy=ACC)
    with pytest.raises(ValueError):
        approx_percentile_profile(fuzz_df, "v", ["g"], [0.5], accuracy=0)
    with pytest.raises(ValueError):
        verify_percentile_profile(
            fuzz_df, fuzz_df.limit(0), "v", ["g"], accuracy=-1
        )


def test_profile_plan_is_one_mergeable_sketch_exchange(spark, fuzz_df):
    """The 100 TB pin, profile half: partial GK sketches map-side
    (ObjectHashAggregate + partial_percentile_approx), EXACTLY one hash
    exchange keyed by the group, merge+finalize reduce-side; the
    posexplode unpivot is map-side after the agg; zero Python nodes and
    zero sorts (the sketch path never sorts the corpus)."""
    prof = approx_percentile_profile(fuzz_df, "v", ["g"], PS, accuracy=ACC)
    buf = io.StringIO()
    with redirect_stdout(buf):
        prof.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "partial_percentile_approx" in plan
    assert "ObjectHashAggregate" in plan
    assert "EvalPython" not in plan
    assert not re.search(r"\(\d+\) Sort\b", plan)


def test_full_query_plan_broadcast_verify_no_shuffle_join(spark):
    """The 100 TB pin, verification half: the k-row profile broadcasts
    back over the corpus (BroadcastHashJoin — never a shuffle join),
    the conditional counts partial-aggregate map-side, and no Python
    node appears anywhere in the registered query's plan."""
    import __spark_entry__ as entry

    df = entry.queries()["approx_percentile_profile"](
        spark, "/root/testdata/sf0.001"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "EvalPython" not in plan
