"""transformWithState (Spark 4 StatefulProcessor API) operators, driven
through a real multi-batch stream and cross-checked against the
applyInPandasWithState implementations in stateful.py — same semantics,
different state backend."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest

from meds_polars_functions_spark.streaming.stateful import (
    streaming_first_seen_dedup,
    streaming_running_stats,
)
from meds_polars_functions_spark.streaming.stateful_v2 import (
    tws_available,
    tws_first_seen_dedup,
    tws_running_stats,
)

pytestmark = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState needs google.protobuf (present on real "
    "clusters, absent in this container); stateful.py covers the "
    "same semantics via applyInPandasWithState",
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def three_batch_dir(spark):
    d = tempfile.mkdtemp(prefix="tws_batches_")
    batches = [
        [
            (1, dt.datetime(2024, 1, 1, 10, 0), 7, "click", 1.0, None),
            (2, dt.datetime(2024, 1, 1, 10, 1), 7, "view", 5.0, None),
            (3, dt.datetime(2024, 1, 1, 10, 2), 9, "click", 2.0, None),
        ],
        [
            (4, dt.datetime(2024, 1, 1, 11, 0), 7, "click", 10.0, None),
            (5, dt.datetime(2024, 1, 1, 11, 1), 9, "purchase", 4.0, None),
        ],
        [
            (6, dt.datetime(2024, 1, 1, 12, 0), 7, "view", 2.5, None),
            (7, dt.datetime(2024, 1, 1, 12, 1), 11, "click", None, None),
        ],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, src_dir, transform, name):
    schema = spark.read.parquet(os.path.join(src_dir, "f0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "*"))
    )
    ckpt = tempfile.mkdtemp(prefix="tws_ckpt_")
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table(name).collect()
    shutil.rmtree(ckpt, ignore_errors=True)
    return rows


def test_tws_running_stats_matches_v1(spark, three_batch_dir):
    got_v2 = _run(spark, three_batch_dir, tws_running_stats, "tws_stats_out")
    got_v1 = _run(spark, three_batch_dir, streaming_running_stats, "v1_stats_out")

    def final_per_key(rows):
        out = {}
        for r in rows:
            cur = out.get(r["key"])
            if cur is None or r["total_events"] > cur["total_events"]:
                out[r["key"]] = r
        return {
            k: (r["total_events"], r["total_sum"], r["running_max"])
            for k, r in out.items()
        }

    v1, v2 = final_per_key(got_v1), final_per_key(got_v2)
    assert set(v1) == set(v2) == {7, 9, 11}
    for k in v1:
        assert v2[k][0] == v1[k][0], k
        assert v2[k][1] == pytest.approx(v1[k][1]), k
        if v1[k][2] is None:
            assert v2[k][2] is None
        else:
            assert v2[k][2] == pytest.approx(v1[k][2]), k
    # lifetime totals crossed batches
    assert v2[7][0] == 4 and v2[7][1] == pytest.approx(18.5)
    # all-null values for key 11 -> max stays null
    assert v2[11] == (1, 0.0, None)


def test_tws_first_seen_dedup_matches_v1(spark, three_batch_dir):
    got_v2 = _run(spark, three_batch_dir, tws_first_seen_dedup, "tws_dedup_out")
    got_v1 = _run(spark, three_batch_dir, streaming_first_seen_dedup, "v1_dedup_out")
    v2 = {(r["key"], r["content"]) for r in got_v2}
    v1 = {(r["key"], r["content"]) for r in got_v1}
    assert v2 == v1
    # batch-2 'click' and batch-3 'view' for user 7 must not re-emit
    assert v2 == {
        (7, "click"),
        (7, "view"),
        (9, "click"),
        (9, "purchase"),
        (11, "click"),
    }
    assert len(got_v2) == 5
