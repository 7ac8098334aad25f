"""HLL distinct-count sketches: exactness in sparse mode, bounded error
at scale, and lossless shard-merge (the property that makes per-dataset
code metadata mergeable without re-scanning facts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meds_polars_functions_spark.functions.sketches import (
    estimate_sketch,
    merge_sketch_tables,
    sketch_distinct,
)


def test_sparse_mode_exact(spark):
    df = spark.range(1000).select(
        (F.col("id") % 5).alias("code"), (F.col("id") % 150).alias("pid")
    )
    out = estimate_sketch(
        sketch_distinct(df, ["code"], "pid", "sk"), "sk", "n_patients"
    ).collect()
    assert all(r["n_patients"] == 30 for r in out)


def test_error_bounded_at_scale(spark):
    df = spark.range(200_000).select(
        (F.col("id") % 2).alias("code"), F.col("id").alias("pid")
    )
    out = estimate_sketch(
        sketch_distinct(df, ["code"], "pid", "sk"), "sk", "est"
    ).collect()
    for r in out:
        assert abs(r["est"] - 100_000) / 100_000 < 0.02


def test_shard_merge_equals_whole(spark):
    """Union of per-shard sketches == sketch of the union (merge is
    lossless), so incremental/per-dataset metadata refresh is sound."""
    df = spark.range(50_000).select(
        (F.col("id") % 3).alias("code"), (F.col("id") % 7919).alias("pid")
    )
    shards = [df.filter(F.col("id") % 4 == i) for i in range(4)]
    sketched = [sketch_distinct(s, ["code"], "pid", "sk") for s in shards]
    merged = estimate_sketch(
        merge_sketch_tables(sketched, ["code"], "sk"), "sk", "est"
    )
    whole = estimate_sketch(sketch_distinct(df, ["code"], "pid", "sk"), "sk", "est")
    m = {r["code"]: r["est"] for r in merged.collect()}
    w = {r["code"]: r["est"] for r in whole.collect()}
    assert m == w


def test_bitmap_distinct_exact_and_mergeable(spark):
    from meds_polars_functions_spark.functions.sketches import (
        bitmap_distinct,
        bitmap_distinct_state,
        merge_bitmap_states,
    )

    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("code"), (F.col("id") % 7919).alias("pid")
    )
    got = {r["code"]: r["n"] for r in bitmap_distinct(df, ["code"], "pid", "n").collect()}
    exact = {
        r["code"]: r["n"]
        for r in df.groupBy("code").agg(F.countDistinct("pid").alias("n")).collect()
    }
    assert got == exact  # zero-error, unlike HLL

    # shard-merge: two disjoint-ish shards, merged state == whole-data count
    a, b = df.filter("pid % 2 = 0"), df.filter("pid % 2 = 1")
    merged = merge_bitmap_states(
        [
            bitmap_distinct_state(a, ["code"], "pid"),
            bitmap_distinct_state(b, ["code"], "pid"),
        ],
        ["code"],
        "n",
    )
    assert {r["code"]: r["n"] for r in merged.collect()} == exact


def test_approx_percentile_bounded_error_vs_exact(spark):
    """approx_percentile is the scale path for quantiles (mergeable
    GK sketch, map-side combine); exact `percentile` is the oracle-able
    path (group_median query). Bound the sketch's rank error here."""
    df = spark.range(100_000).select(
        (F.col("id") % 4).alias("g"), (F.hash("id") % 10_000).alias("v")
    )
    joined = (
        df.groupBy("g")
        .agg(
            F.expr("approx_percentile(v, 0.5, 1000)").alias("approx"),
            F.expr("percentile(v, 0.5)").alias("exact"),
        )
        .collect()
    )
    for r in joined:
        # 1/accuracy rank error -> value error bounded by the local density;
        # with ~25k uniform values over 20k span, 1% of rank ~ 200 in value
        assert abs(r["approx"] - r["exact"]) <= 400, r


def test_count_min_overestimates_and_is_tight_when_wide(spark):
    """CMS guarantee: est >= true count always; with width >> distinct
    keys collisions are rare, so most estimates are exact."""
    from meds_polars_functions_spark.functions.sketches import (
        count_min_build,
        count_min_estimate,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    truth = {
        r["l_suppkey"]: r["n"]
        for r in li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cms = count_min_build(li, "l_suppkey", depth=4, width=2048)
    probes = li.select("l_suppkey").distinct()
    est = {
        r["probe"]: r["est"]
        for r in count_min_estimate(cms, probes, "l_suppkey", depth=4, width=2048).collect()
    }
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)
    exact = sum(1 for k in truth if est[k] == truth[k])
    assert exact / len(truth) > 0.9


def test_count_min_merge_equals_whole(spark):
    """Sketch of a union == per-cell sum of the parts' sketches — the
    mergeability that lets shard sketches combine without re-scans."""
    from meds_polars_functions_spark.functions.sketches import (
        count_min_build,
        count_min_estimate,
        count_min_merge,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = count_min_merge(
        count_min_build(a, "l_suppkey", 4, 128), count_min_build(b, "l_suppkey", 4, 128)
    )
    whole = count_min_build(li, "l_suppkey", 4, 128)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_binned_histogram_merges_across_shards(spark):
    """The cell table is an additive sketch: hist(A) + hist(B) summed
    cell-wise equals hist(A ∪ B) — the shard-reduce contract."""
    import pyspark.sql.functions as F

    from meds_polars_functions_spark.functions.sketches import binned_histogram

    vals = [(i, float((i * 37) % 100)) for i in range(200)]
    df = spark.createDataFrame(vals, ["id", "v"])
    a = df.filter(F.col("id") < 90)
    b = df.filter(F.col("id") >= 90)
    whole = binned_histogram(df, "v", lo=0.0, hi=100.0, n_bins=10)
    merged = (
        binned_histogram(a, "v", lo=0.0, hi=100.0, n_bins=10)
        .unionByName(binned_histogram(b, "v", lo=0.0, hi=100.0, n_bins=10))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_binned_quantiles_within_one_bin_of_exact(spark):
    import numpy as np

    from meds_polars_functions_spark.functions.sketches import (
        binned_histogram,
        binned_quantiles,
    )

    raw = [float((i * 97) % 1000) for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in raw], ["v"])
    hist = binned_histogram(df, "v", lo=0.0, hi=1000.0, n_bins=100)
    out = binned_quantiles(hist, [0.1, 0.5, 0.9], lo=0.0, hi=1000.0, n_bins=100)
    got = {r["q"]: r["est"] for r in out.collect()}
    width = 10.0
    for q in (0.1, 0.5, 0.9):
        exact = np.quantile(np.array(raw), q)
        # upper-edge estimate: exact value lies within one bin below
        assert exact <= got[q] <= exact + width + 1e-9, (q, got[q], exact)


def test_binned_histogram_clamps_tails(spark):
    from meds_polars_functions_spark.functions.sketches import binned_histogram

    df = spark.createDataFrame(
        [(-50.0,), (0.0,), (99.0,), (250.0,), (None,)], "v double"
    )
    got = {r["bin"]: r["cnt"] for r in binned_histogram(df, "v", lo=0.0, hi=100.0, n_bins=10).collect()}
    assert got == {0: 2, 9: 2}  # -50 clamps to bin 0, 250 to bin 9; null dropped


def test_winsorize_by_quantile_clamps_outliers(spark):
    from meds_polars_functions_spark.functions.sketches import winsorize_by_quantile

    vals = [float(v) for v in range(1, 100)] + [10_000.0]  # one wild outlier
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = winsorize_by_quantile(
        df, "v", q_lo=0.1, q_hi=0.9, lo=0.0, hi=200.0, n_bins=200, out_col="w"
    )
    rows = out.collect()
    assert len(rows) == 100
    ws = sorted(r["w"] for r in rows)
    # outlier clamped to the 0.9-quantile bin edge (within [lo, hi))
    assert ws[-1] <= 92.0
    # low tail clamped up to the 0.1 edge
    assert ws[0] >= 10.0
    # mid-range untouched
    assert 50.0 in ws


def test_binned_drift_metrics_identical_distributions_zero(spark):
    from meds_polars_functions_spark.functions.sketches import (
        binned_drift_metrics,
        binned_histogram,
    )

    vals = [(float((i * 37) % 100),) for i in range(500)]
    df = spark.createDataFrame(vals, ["v"])
    h = binned_histogram(df, "v", lo=0.0, hi=100.0, n_bins=20)
    row = binned_drift_metrics(h, h).collect()[0]
    assert row["ks"] == 0.0
    assert row["psi"] == 0.0


def test_binned_drift_metrics_detects_shift(spark):
    import numpy as np

    from meds_polars_functions_spark.functions.sketches import (
        binned_drift_metrics,
        binned_histogram,
    )

    rng = np.random.default_rng(2)
    a = spark.createDataFrame([(float(v),) for v in rng.normal(40, 10, 2000)], ["v"])
    b = spark.createDataFrame([(float(v),) for v in rng.normal(60, 10, 2000)], ["v"])
    ha = binned_histogram(a, "v", lo=0.0, hi=100.0, n_bins=50)
    hb = binned_histogram(b, "v", lo=0.0, hi=100.0, n_bins=50)
    row = binned_drift_metrics(ha, hb).collect()[0]
    # 2-sigma mean shift: KS near theoretical max |Phi(x-40)-Phi(x-60)| ~ 0.68
    assert 0.6 < row["ks"] < 0.8
    assert row["psi"] > 0.2  # conventional "significant shift" alarm fires
    # drift in the other direction is symmetric for KS
    rev = binned_drift_metrics(hb, ha).collect()[0]
    assert rev["ks"] == row["ks"]


def test_binned_drift_metrics_disjoint_group_bins_align(spark):
    from meds_polars_functions_spark.functions.sketches import (
        binned_drift_metrics,
        binned_histogram,
    )

    a = spark.createDataFrame([("g", 5.0), ("g", 15.0)], ["grp", "v"])
    b = spark.createDataFrame([("g", 95.0)], ["grp", "v"])
    ha = binned_histogram(a, "v", ["grp"], lo=0.0, hi=100.0, n_bins=10)
    hb = binned_histogram(b, "v", ["grp"], lo=0.0, hi=100.0, n_bins=10)
    row = binned_drift_metrics(ha, hb, ["grp"]).collect()[0]
    assert row["ks"] == 1.0  # fully separated supports


def test_winsorize_nulls_pass_through_unclamped(spark):
    # ADVICE r3: greatest(NULL, lo) = lo in Spark (nulls skipped), so an
    # unguarded clamp silently rewrites NULL measurements to the lower
    # quantile bound. Nulls must stay null.
    from meds_polars_functions_spark.functions.sketches import winsorize_by_quantile

    rows = [("g", float(v)) for v in range(1, 100)] + [("g", None), ("h", None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize_by_quantile(
        df, "v", ["grp"], q_lo=0.1, q_hi=0.9, lo=0.0, hi=200.0, n_bins=200,
        out_col="w",
    ).collect()
    assert len(out) == 101  # group h (all null -> no bounds) NOT dropped
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["w"])
    assert by_grp["g"].count(None) == 1  # null stays null, not q_lo
    assert by_grp["h"] == [None]
    # ungrouped path: constant-key left join, all-null input survives
    allnull = spark.createDataFrame([(None,), (None,)], "v double")
    got = winsorize_by_quantile(allnull, "v", out_col="w").collect()
    assert [r["w"] for r in got] == [None, None]


def test_binned_drift_metrics_one_sided_group_ks_one(spark):
    # ADVICE r3: a group present in only one histogram had a zero CDF
    # denominator -> DIVIDE_BY_ZERO under ANSI. Defined: KS = 1.0.
    from meds_polars_functions_spark.functions.sketches import (
        binned_drift_metrics,
        binned_histogram,
    )

    a = spark.createDataFrame([("g", 5.0), ("only_a", 7.0)], ["grp", "v"])
    b = spark.createDataFrame([("g", 95.0)], ["grp", "v"])
    ha = binned_histogram(a, "v", ["grp"], lo=0.0, hi=100.0, n_bins=10)
    hb = binned_histogram(b, "v", ["grp"], lo=0.0, hi=100.0, n_bins=10)
    got = {r["grp"]: r for r in binned_drift_metrics(ha, hb, ["grp"]).collect()}
    assert got["only_a"]["ks"] == 1.0
    assert got["only_a"]["psi"] is not None  # smoothing keeps PSI finite
    assert got["g"]["ks"] == 1.0  # disjoint supports, both sides present


def test_bitmap_overlap_exact_vs_brute_force(spark):
    """bitmap_overlap == plain distinct-set arithmetic on every group,
    including groups present on one side only and zero-intersection
    groups."""
    from meds_polars_functions_spark.functions.sketches import bitmap_overlap

    a = spark.range(900).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 50).alias("k")
    )
    b = spark.range(900).select(
        (F.col("id") % 4).alias("g"), ((F.col("id") % 40) + 30).alias("k")
    )
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["n_union"], r["n_inter"], r["jaccard"])
        for r in bitmap_overlap(a, b, ["g"], "k").collect()
    }
    sa = {g: set() for g in range(4)}
    sb = {g: set() for g in range(4)}
    for i in range(900):
        sa[i % 3].add(i % 50)
        sb[i % 4].add((i % 40) + 30)
    for g in range(4):
        A, B = sa[g], sb[g]
        if not A and not B:
            assert g not in got
            continue
        u = len(A | B)
        want = (
            len(A), len(B), u, len(A & B),
            round(len(A & B) / u, 9) if u else 0.0,
        )
        assert got[g] == want, (g, got[g], want)


def test_bitmap_overlap_one_pass_two_exchanges_no_join(spark):
    """The 100 TB pin: tagged-union + FILTER-ed bitmap aggregates —
    exactly TWO exchanges ((group,bucket) then group), ZERO Join nodes,
    zero Python, never a row-pair expansion."""
    from meds_polars_functions_spark.functions.sketches import bitmap_overlap

    a = spark.range(200).select((F.col("id") % 2).alias("g"), F.col("id").alias("k"))
    b = spark.range(200).select((F.col("id") % 2).alias("g"), (F.col("id") + 100).alias("k"))
    plan = bitmap_overlap(a, b, ["g"], "k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan
    assert "Python" not in plan


def test_hll_overlap_tracks_exact_within_bounds(spark):
    """HLL inclusion-exclusion vs the exact bitmap path on overlapping
    ranges: per-term error is ~1% at lgK 12, so union/side estimates
    must sit within 2% and the intersection inside the compounded
    3-term envelope."""
    from meds_polars_functions_spark.functions.sketches import (
        bitmap_overlap,
        hll_overlap,
    )

    a = spark.range(60_000).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    b = spark.range(40_000, 120_000).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    exact = bitmap_overlap(a, b, ["g"], "k").collect()[0]
    est = hll_overlap(a, b, ["g"], "k").collect()[0]
    assert abs(est["n_a"] - exact["n_a"]) / exact["n_a"] < 0.05
    assert abs(est["n_b"] - exact["n_b"]) / exact["n_b"] < 0.05
    assert abs(est["n_union"] - exact["n_union"]) / exact["n_union"] < 0.05
    # 3-term compounding on |A∩B| = 20_000 out of 120_000 union
    assert abs(est["n_inter"] - exact["n_inter"]) <= 0.15 * exact["n_union"]


def test_hll_overlap_sparse_mode_exact_and_outer_groups(spark):
    """Sparse-mode sketches are exact, so small-cardinality overlaps
    must be EXACT through the sketch join; a group on one side only
    reports (n, 0, n, 0, 0.0) through the full-outer."""
    from meds_polars_functions_spark.functions.sketches import hll_overlap

    a = spark.createDataFrame(
        [("x", i) for i in range(20)] + [("solo", i) for i in range(5)],
        "g string, k long",
    )
    b = spark.createDataFrame([("x", i) for i in range(10, 40)], "g string, k long")
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["n_union"], r["n_inter"], r["jaccard"])
        for r in hll_overlap(a, b, ["g"], "k").collect()
    }
    assert got["x"] == (20, 30, 40, 10, 0.25)
    assert got["solo"] == (5, 0, 5, 0, 0.0)


def test_hll_overlap_from_sketches_merges_shards(spark):
    """The sketch-JOIN property that matters at 100 TB: per-shard
    sketch states merged via merge_sketch_tables feed
    hll_overlap_from_sketches and give the SAME overlap as sketching
    each whole corpus — the raw corpora are never re-read."""
    from meds_polars_functions_spark.functions.sketches import (
        hll_overlap,
        hll_overlap_from_sketches,
        merge_sketch_tables,
        sketch_distinct,
    )

    a = spark.range(3000).select((F.col("id") % 2).alias("g"), (F.col("id") % 500).alias("k"))
    b = spark.range(3000).select((F.col("id") % 2).alias("g"), ((F.col("id") % 400) + 300).alias("k"))
    whole = {
        (r["g"]): (r["n_a"], r["n_b"], r["n_union"], r["n_inter"])
        for r in hll_overlap(a, b, ["g"], "k").collect()
    }
    sa = merge_sketch_tables(
        [sketch_distinct(a.filter(F.col("k") % 3 == i), ["g"], "k", "sk") for i in range(3)],
        ["g"], "sk",
    )
    sb = merge_sketch_tables(
        [sketch_distinct(b.filter(F.col("k") % 2 == i), ["g"], "k", "sk") for i in range(2)],
        ["g"], "sk",
    )
    merged = {
        (r["g"]): (r["n_a"], r["n_b"], r["n_union"], r["n_inter"])
        for r in hll_overlap_from_sketches(sa, sb, ["g"], "sk").collect()
    }
    assert merged == whole


def test_hll_overlap_flags_flip_on_degraded_sketch(spark):
    """Falsifiability for the q_hll_user_overlap invariant flags: the
    SAME flag predicate computed from a deliberately-degraded sketch
    (lgK 4 -> ~26% std error) on a 50k-cardinality corpus must flip to
    False for the side/union tolerance — i.e. the flag genuinely reacts
    to sketch defects and 1.0 is not vacuous."""
    from meds_polars_functions_spark.functions.sketches import hll_overlap

    a = spark.range(50_000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    b = spark.range(25_000, 75_000).select(
        F.lit("g").alias("g"), F.col("id").alias("k")
    )
    exact = (50_000, 50_000, 75_000)

    def flags(lgk):
        r = hll_overlap(a, b, ["g"], "k", lgk=lgk).collect()[0]
        tol = 0.05
        return (
            abs(r["n_a"] - exact[0]) <= tol * exact[0]
            and abs(r["n_b"] - exact[1]) <= tol * exact[1]
            and abs(r["n_union"] - exact[2]) <= tol * exact[2]
        )

    assert flags(12) is True
    assert flags(4) is False


def test_flagged_overlap_forms_equal_two_sided(spark):
    """The single-pass flagged forms are output-IDENTICAL to the
    two-sided APIs on the same memberships — bitmap exactly, HLL
    register-exactly (sketch state depends only on each side's value
    set). This is the identity that let the round-13 staged queries
    drop from 4 (resp. 6) corpus scans to one data pass."""
    from meds_polars_functions_spark.functions.sketches import (
        bitmap_overlap,
        bitmap_overlap_flags,
        hll_overlap,
        hll_overlap_flags,
    )

    base = spark.range(2000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 211).alias("k"),
        ((F.col("id") % 7) < 4).alias("fa"),
        ((F.col("id") % 5) < 2).alias("fb"),
    )
    a = base.filter("fa")
    b = base.filter("fb")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(bitmap_overlap_flags(base, ["g"], "k", "fa", "fb")) == rows(
        bitmap_overlap(a, b, ["g"], "k")
    )
    assert rows(hll_overlap_flags(base, ["g"], "k", "fa", "fb")) == rows(
        hll_overlap(a, b, ["g"], "k")
    )


def test_flagged_forms_reject_expression_shaped_columns(spark):
    """The *_flags forms splice column names into SQL FILTER clauses;
    anything expression-shaped must raise, not parse as SQL (the
    ADVICE r12 collision-guard class, applied proactively)."""
    import pytest

    from meds_polars_functions_spark.functions.sketches import (
        bitmap_overlap_flags,
        hll_overlap_flags,
    )
    from meds_polars_functions_spark.streaming.events import (
        streaming_hll_overlap,
    )

    df = spark.createDataFrame(
        [(1, "g", True, False)], "k long, g string, fa boolean, fb boolean"
    )
    for fn in (bitmap_overlap_flags, hll_overlap_flags):
        with pytest.raises(ValueError, match="bare column identifier"):
            fn(df, ["g"], "k", "fa OR true", "fb")
        with pytest.raises(ValueError, match="bare column identifier"):
            fn(df, ["g"], "k; DROP TABLE x", "fa", "fb")
    with pytest.raises(ValueError, match="bare column identifier"):
        streaming_hll_overlap(df, ["g"], "k", "fa", "fb = fb")
    # the two-sided APIs splice key_col the same way (ADVICE r13
    # item 1): same guard, same error
    from meds_polars_functions_spark.functions.sketches import (
        bitmap_overlap,
        hll_overlap,
    )

    for fn in (bitmap_overlap, hll_overlap):
        with pytest.raises(ValueError, match="bare column identifier"):
            fn(df, df, ["g"], "k + 1")
    # ... and the single-population bitmap forms (round-14 proactive
    # sweep of every remaining f-string splice site)
    from meds_polars_functions_spark.functions.sketches import (
        bitmap_distinct,
        bitmap_distinct_state,
        windowed_bitmap_cells,
        windowed_sketch_retention,
    )

    for fn in (bitmap_distinct, bitmap_distinct_state):
        with pytest.raises(ValueError, match="bare column identifier"):
            fn(df, ["g"], "k; DROP TABLE x")
    # the windowed forms also splice the INTERVAL duration: only a
    # plain '<n> <unit>' passes
    tdf = df.withColumn("ts", F.lit("2024-01-01").cast("timestamp"))
    with pytest.raises(ValueError, match="duration"):
        windowed_bitmap_cells(tdf, "ts", ["g"], "k", "1 day) + (SELECT 1")
    with pytest.raises(ValueError, match="duration"):
        windowed_sketch_retention(tdf, "ts", ["g"], "k", window="x; --")
    # clean identifiers still work
    assert bitmap_overlap_flags(df, ["g"], "k", "fa", "fb").count() == 1
    assert windowed_bitmap_cells(tdf, "ts", ["g"], "k", "1 day").count() == 1


def test_windowed_bitmap_cells_shard_merge_law(spark):
    """The watermark-state merge law of the round-14 family: the
    per-(group, window, bucket) bitmap cells of a corpus equal the
    ``bitmap_or_agg`` per-cell merge of the cells of ANY shard split —
    which is exactly why the same per-window state survives as a
    streaming aggregation buffer (partial cells merge losslessly,
    whatever micro-batch boundary produced them)."""
    from meds_polars_functions_spark.functions.sketches import (
        windowed_bitmap_cells,
    )

    df = spark.range(600).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 157).alias("k"),
        F.to_timestamp(
            F.lit("2024-01-01 00:00:00")
        ).alias("t0"),
    ).select(
        "g", "k",
        (F.col("t0") + F.make_interval(hours=(F.col("k") % 90) * 2)).alias("ts"),
    ).drop("t0")
    full = windowed_bitmap_cells(df, "ts", ["g"], "k", "1 day")
    s1 = windowed_bitmap_cells(df.filter(F.col("k") % 2 == 0), "ts", ["g"], "k", "1 day")
    s2 = windowed_bitmap_cells(df.filter(F.col("k") % 2 != 0), "ts", ["g"], "k", "1 day")
    merged = (
        s1.unionByName(s2)
        .groupBy("g", "window_start", "__bkt__")
        .agg(
            F.expr("bitmap_count(bitmap_or_agg(__bmp__))").alias("cnt"),
        )
    )
    want = sorted(
        (r["g"], r["window_start"], r["__bkt__"], r["__cnt__"])
        for r in full.collect()
    )
    got = sorted(
        (r["g"], r["window_start"], r["__bkt__"], r["cnt"])
        for r in merged.collect()
    )
    assert want and got == want
