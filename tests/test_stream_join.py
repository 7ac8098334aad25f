"""Stream-stream interval join: runs as a REAL stream (file source,
availableNow trigger, append mode — the only mode stream-stream inner
joins support) and must agree with the same function executed in batch."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.streaming.joins import stream_interval_join


def _t(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def join_dirs(spark):
    clicks = spark.createDataFrame(
        [
            (1, 100, _t(0)),
            (2, 100, _t(30)),
            (3, 200, _t(0)),
            (4, 300, _t(0)),  # user with no purchase
        ],
        "click_id long, user_id long, click_ts timestamp",
    )
    purchases = spark.createDataFrame(
        [
            (10, 100, _t(10)),  # within 1h of clicks 1 and 2? 1: +10m yes; 2: -20m no
            (11, 200, _t(90)),  # 90m after click 3 -> outside 1h window
            (12, 400, _t(5)),  # user with no click
        ],
        "purchase_id long, user_id long, purchase_ts timestamp",
    )
    dirs = []
    for df in (clicks, purchases):
        d = tempfile.mkdtemp(prefix="sjoin_")
        df.write.mode("overwrite").parquet(d)
        dirs.append(d)
    yield dirs
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def _join(lhs, rhs):
    return stream_interval_join(
        lhs, rhs, "user_id", "click_ts", "purchase_ts", 0, 3600
    ).select("click_id", "purchase_id")


@pytest.mark.slow
def test_stream_interval_join_matches_batch(spark, join_dirs):
    click_dir, purchase_dir = join_dirs
    batch = _join(
        spark.read.parquet(click_dir), spark.read.parquet(purchase_dir)
    ).collect()
    assert {(r.click_id, r.purchase_id) for r in batch} == {(1, 10)}

    cs = spark.readStream.schema(spark.read.parquet(click_dir).schema).parquet(
        click_dir
    )
    ps = spark.readStream.schema(
        spark.read.parquet(purchase_dir).schema
    ).parquet(purchase_dir)
    out = _join(cs, ps)
    ckpt = tempfile.mkdtemp(prefix="ckpt_sjoin_")
    q = (
        out.writeStream.format("memory")
        .queryName("sjoin_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("sjoin_out").collect()
    shutil.rmtree(ckpt, ignore_errors=True)
    assert {(r.click_id, r.purchase_id) for r in streamed} == {
        (r.click_id, r.purchase_id) for r in batch
    }


def test_stream_interval_join_rejects_ambiguous_columns(spark, join_dirs):
    click_dir, _ = join_dirs
    df = spark.read.parquet(click_dir)
    with pytest.raises(ValueError, match="ambiguous"):
        stream_interval_join(df, df, "user_id", "click_ts", "click_ts", 0, 60)
