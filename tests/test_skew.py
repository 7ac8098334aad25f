"""Skew-mitigation helpers must be exactly equivalent to their direct
formulations, and the NRT round-trip must be lossless."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from meds_polars_functions_spark.functions.skew import (
    count_distinct_twophase,
    salted_collect_list,
)
from meds_polars_functions_spark.sources.writers import read_nrt, write_nrt


def test_count_distinct_twophase_equiv(spark, meds_df):
    direct = {
        r["code"]: r["n"]
        for r in meds_df.groupBy("code")
        .agg(F.countDistinct("patient_id").alias("n"))
        .collect()
    }
    twophase = {
        r["code"]: r["patient_id_n_distinct"]
        for r in count_distinct_twophase(meds_df, ["code"], "patient_id").collect()
    }
    assert direct == twophase


def test_salted_collect_equiv(spark):
    rows = [(1, i, f"v{i}") for i in range(50)] + [(2, i, f"w{i}") for i in range(7)]
    df = spark.createDataFrame(rows, "g int, o int, v string").repartition(8)
    direct = {
        r["g"]: r["lst"]
        for r in df.groupBy("g")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("o", "v"))), lambda s: s["v"]
            ).alias("lst")
        )
        .collect()
    }
    salted = {
        r["g"]: r["v_list"]
        for r in salted_collect_list(df, ["g"], "v", "o", n_salts=4).collect()
    }
    assert direct == salted


def test_nrt_roundtrip(spark, meds_df):
    from meds_polars_functions_spark.operators.tokenization import (
        extract_seq_of_patient_events,
    )

    seqs = extract_seq_of_patient_events(
        meds_df, code_as_double=False, nan_fill=False
    )
    expected = {
        r["patient_id"]: r["code"] for r in seqs.collect()
    }
    d = tempfile.mkdtemp(prefix="nrt_rt_")
    try:
        write_nrt(seqs.repartition(3), d, ["time_delta_days", "code", "numeric_value"])
        back = read_nrt(d)
        pids = back["patient_id"]
        outer = back["code__offsets"]
        inner = back["code__inner_offsets"]
        vals = back["code__values"]
        assert len(pids) + 1 == len(outer)
        got: dict = {}
        for i, pid in enumerate(pids):
            events = []
            for ev in range(outer[i], outer[i + 1]):
                events.append(list(vals[inner[ev] : inner[ev + 1]]))
            got[pid] = events
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_topk_per_group_matches_direct_window(spark):
    from meds_polars_functions_spark.functions.skew import topk_per_group

    df = (
        spark.range(0, 5000)
        .selectExpr(
            "id % 37 AS g",
            "id AS i",
            "cast(hash(id) % 1000 as double) AS v",
        )
        .repartition(8)  # multiple partitions so the prune phase matters
    )
    got = topk_per_group(df, ["g"], "v", 4, tie_cols=["i"], rank_col="rk")
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("i"))
    direct = (
        df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 4)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))
    # ascending variant too
    got_asc = topk_per_group(df, ["g"], "v", 2, ascending=True, tie_cols=["i"])
    w2 = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("i"))
    direct_asc = (
        df.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= 2)
        .drop("rk")
    )
    assert sorted(map(tuple, got_asc.collect())) == sorted(
        map(tuple, direct_asc.collect())
    )


def test_salted_join_matches_plain_join(spark):
    from meds_polars_functions_spark.functions.skew import salted_join

    # heavily skewed left: 90% of rows on key 0
    left = spark.range(0, 2000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 50 END AS k", "id AS lv"
    )
    right = spark.range(0, 50).selectExpr("id AS k", "id * 100 AS rv")
    for how in ("inner", "left"):
        got = salted_join(left, right.limit(30), ["k"], n_salts=4, how=how)
        want = left.join(right.limit(30), ["k"], how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), how


def test_profile_table_one_pass(spark, meds_df):
    from meds_polars_functions_spark.functions.profile import profile_table

    out = {r["column"]: r for r in profile_table(meds_df, ["code", "numeric_value"]).collect()}
    n = meds_df.count()
    assert out["code"]["n_rows"] == n
    assert out["code"]["n_nulls"] == 0
    assert out["code"]["n_distinct"] == meds_df.select("code").distinct().count()
    nv = out["numeric_value"]
    assert nv["n_nulls"] == meds_df.filter("numeric_value IS NULL").count()
    # single job: plan has exactly one scan of the source
    plan = profile_table(meds_df, ["code", "numeric_value"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") <= 1
