"""Structured Streaming tests: the windowed aggregations run as a REAL
stream (file source, availableNow trigger) and must agree with their
batch execution — the exactly-once, watermark-correct path."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.streaming.events import windowed_event_counts
from meds_polars_functions_spark.streaming.sessions import sessionize


@pytest.fixture(scope="module")
def event_stream_dir(spark):
    d = tempfile.mkdtemp(prefix="events_stream_")
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0), 100, "click", 1.0, None),
        (2, dt.datetime(2024, 1, 1, 10, 20, 0), 100, "click", 2.0, None),
        (3, dt.datetime(2024, 1, 1, 11, 5, 0), 100, "view", 3.0, None),
        (4, dt.datetime(2024, 1, 1, 10, 40, 0), 200, "click", 4.0, None),
        (5, dt.datetime(2024, 1, 1, 12, 0, 0), 200, "view", 5.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, transform, src_dir):
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = transform(stream)
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_test_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.table("stream_test_out").collect()
    shutil.rmtree(ckpt, ignore_errors=True)
    return res


def test_windowed_counts_streaming_matches_batch(spark, event_stream_dir):
    batch = windowed_event_counts(
        spark.read.parquet(event_stream_dir), window_duration="1 hour"
    ).collect()
    streamed = _run_stream(
        spark,
        lambda s: windowed_event_counts(s, window_duration="1 hour"),
        event_stream_dir,
    )
    as_set = lambda rows: {
        (r["window_start"], r["event_type"], r["n_events"], r["n_users"], r["value_sum"])
        for r in rows
    }
    assert as_set(batch) == as_set(streamed)
    assert (
        dt.datetime(2024, 1, 1, 10, 0, 0),
        "click",
        3,
        2,
        7.0,
    ) in as_set(batch)


def test_sessionize_streaming_matches_batch(spark, event_stream_dir):
    batch = sessionize(spark.read.parquet(event_stream_dir), gap="30 minutes").collect()
    streamed = _run_stream(
        spark, lambda s: sessionize(s, gap="30 minutes"), event_stream_dir
    )
    key = lambda rows: {
        (r["user_id"], r["first_event"], r["last_event"], r["n_events"]) for r in rows
    }
    assert key(batch) == key(streamed)
    # user 100: events at 10:00 and 10:20 chain (gap<30m); 11:05 is new
    sessions_100 = sorted(
        (r["first_event"], r["n_events"]) for r in batch if r["user_id"] == 100
    )
    assert sessions_100 == [
        (dt.datetime(2024, 1, 1, 10, 0, 0), 2),
        (dt.datetime(2024, 1, 1, 11, 5, 0), 1),
    ]


def test_streaming_dedup_matches_batch_keys(spark, event_stream_dir):
    from meds_polars_functions_spark.streaming.events import streaming_dedup

    # duplicate (user_id, event_type) arrivals exist in the fixture
    def transform(s):
        return streaming_dedup(s, ["user_id", "event_type"]).select(
            "user_id", "event_type"
        )

    # append mode: dropDuplicatesWithinWatermark emits each survivor once
    import tempfile as _tf

    schema = spark.read.parquet(event_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = transform(stream)
    ckpt = _tf.mkdtemp(prefix="ckpt_dedup_")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["event_type"]) for r in spark.table("stream_dedup_out").collect()
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    batch = sorted(
        (r["user_id"], r["event_type"])
        for r in transform(spark.read.parquet(event_stream_dir)).collect()
    )
    assert got == batch
    assert got == [(100, "click"), (100, "view"), (200, "click"), (200, "view")]


@pytest.mark.slow
def test_streaming_hll_overlap_exact_parity_any_order(spark):
    """streaming_hll_overlap == batch hll_overlap_flags EXACTLY (same
    DataSketches registers, merged in the native streaming-agg buffer),
    over THREE SHUFFLED micro-batches of the sf0.001 events split into
    first/last-2-day audience flags — and a reversed batch order gives
    the same final rows. No custom state code anywhere: the declarative
    aggregate IS the state."""
    import os
    import random

    from meds_polars_functions_spark.functions.sketches import hll_overlap_flags
    from meds_polars_functions_spark.streaming.events import streaming_hll_overlap

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.select(F.min(us).alias("lo"), F.max(us).alias("hi"))
    day2 = 2 * 86_400_000_000
    flagged = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        "user_id",
        (us < F.col("lo") + day2).alias("fa"),
        (us >= F.col("hi") - day2).alias("fb"),
    )
    want = sorted(
        tuple(r)
        for r in hll_overlap_flags(
            flagged, ["event_type"], "user_id", "fa", "fb"
        ).collect()
    )
    assert want and any(r[4] not in (0.0, 1.0) for r in want)  # non-degenerate

    rows_all = flagged.collect()
    rng = random.Random(5)
    rng.shuffle(rows_all)
    cut = len(rows_all) // 3
    chunks = [rows_all[:cut], rows_all[cut : 2 * cut], rows_all[2 * cut :]]

    def run_order(chunks, tag):
        d = tempfile.mkdtemp(prefix=f"shllov_{tag}_")
        ckpt = tempfile.mkdtemp(prefix=f"shllov_ck_{tag}_")
        try:
            for i, chunk in enumerate(chunks, 1):
                spark.createDataFrame(chunk, flagged.schema).coalesce(1).write.parquet(
                    os.path.join(d, f"f{i}")
                )
            stream = (
                spark.readStream.schema(flagged.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(d, "*"))
            )
            out = streaming_hll_overlap(
                stream, ["event_type"], "user_id", "fa", "fb"
            )
            q = (
                out.writeStream.format("memory")
                .queryName(f"shllov_{tag}")
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            rows = spark.table(f"shllov_{tag}").collect()
            final = {}
            for r in rows:  # last update per group wins
                if r["n_union"] >= final.get(r["event_type"], (0,))[0]:
                    final[r["event_type"]] = (
                        r["n_union"], r["n_a"], r["n_b"], r["n_inter"], r["jaccard"],
                    )
            return {
                g: (v[1], v[2], v[0], v[3], v[4]) for g, v in final.items()
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    fwd = run_order(chunks, "fwd")
    assert sorted((g, *v) for g, v in fwd.items()) == want
    rev = run_order(chunks[::-1], "rev")
    assert rev == fwd


def test_streaming_hll_overlap_same_expression_on_batch(spark):
    """The operator applied to a plain batch DataFrame is exactly
    hll_overlap_flags — one code path, which is what lets the oracle
    exercise the streaming aggregate in batch."""
    from meds_polars_functions_spark.functions.sketches import hll_overlap_flags
    from meds_polars_functions_spark.streaming.events import streaming_hll_overlap

    df = spark.range(500).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") % 97).alias("k"),
        ((F.col("id") % 3) < 2).alias("fa"),
        ((F.col("id") % 4) < 2).alias("fb"),
    )
    a = sorted(tuple(r) for r in streaming_hll_overlap(df, ["g"], "k", "fa", "fb").collect())
    b = sorted(tuple(r) for r in hll_overlap_flags(df, ["g"], "k", "fa", "fb").collect())
    assert a == b


@pytest.mark.slow
def test_streaming_percentile_profile_holds_gk_guarantee_any_order(spark):
    """The GK profile as a REAL multi-batch stream (3 shuffled
    micro-batches of sf0.001 events): the final per-group rows must
    (i) carry the exact n and exact p0/p100 extremes, and (ii) satisfy
    the GK rank guarantee against the FULL data
    (verify_percentile_profile rank_ok on every row). Interior answers
    may legally differ from the batch run's (merge order changes the
    retained samples) — the guarantee, not bit-equality, is the
    streaming contract."""
    import os
    import random

    from meds_polars_functions_spark.operators.profiles import (
        verify_percentile_profile,
    )
    from meds_polars_functions_spark.streaming.events import (
        streaming_percentile_profile,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ev = ev.select("event_type", "value")
    PS, ACC = [0.0, 0.5, 0.9, 1.0], 100

    rows_all = ev.collect()
    rng = random.Random(11)
    rng.shuffle(rows_all)
    cut = len(rows_all) // 3
    chunks = [rows_all[:cut], rows_all[cut : 2 * cut], rows_all[2 * cut :]]
    d = tempfile.mkdtemp(prefix="sppf_")
    ckpt = tempfile.mkdtemp(prefix="sppf_ck_")
    try:
        for i, chunk in enumerate(chunks, 1):
            spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
                os.path.join(d, f"f{i}")
            )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "*"))
        )
        out = streaming_percentile_profile(
            stream, "value", ["event_type"], PS, accuracy=ACC
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sppf")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.table("sppf").collect()
        final = {}
        for r in rows:  # last update (largest n) per (group, percentile)
            k = (r["event_type"], r["percentile"])
            if r["n"] >= final.get(k, (0, None))[0]:
                final[k] = (r["n"], r["approx_value"])
        # exact n everywhere
        n_want = {
            r["event_type"]: r["n"]
            for r in ev.filter(F.col("value").isNotNull())
            .groupBy("event_type").agg(F.count("value").alias("n")).collect()
        }
        assert {g for g, _ in final} == set(n_want)
        assert all(v[0] == n_want[g] for (g, _), v in final.items())
        # exact extremes
        ext = {
            r["event_type"]: (r["mn"], r["mx"])
            for r in ev.groupBy("event_type")
            .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
            .collect()
        }
        for g, (mn, mx) in ext.items():
            assert final[(g, 0.0)][1] == mn and final[(g, 1.0)][1] == mx
        # GK rank guarantee for every final row, checked against FULL data
        prof = spark.createDataFrame(
            [(g, p, n, v) for (g, p), (n, v) in final.items()],
            "event_type string, percentile double, n long, approx_value double",
        )
        ver = verify_percentile_profile(
            ev, prof, "value", ["event_type"], accuracy=ACC
        )
        bad = [tuple(r) for r in ver.filter(~F.col("rank_ok")).collect()]
        assert not bad, f"streamed answers outside the GK window: {bad}"
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.mark.slow
def test_streaming_hll_overlap_windowed_composition(spark):
    """The docstring's windowed form, pinned: F.window composed into
    group_cols with an upstream watermark gives per-(window, group)
    overlap state, and final estimates equal the batch recompute of
    the same windowed aggregate (same registers, same monoid)."""
    import datetime as dt
    import os

    from meds_polars_functions_spark.streaming.events import (
        streaming_hll_overlap,
    )

    h = dt.datetime(2024, 1, 1, 10, 0)
    rows = []
    for i in range(40):
        ts = h + dt.timedelta(minutes=i * 7)  # spans ~5 hours
        rows.append((ts, "x", i % 13, i % 3 < 2, i % 4 < 2))
    schema = "ts timestamp, g string, k long, fa boolean, fb boolean"
    batch = spark.createDataFrame(rows, schema)

    def transform(df):
        win = df.withWatermark("ts", "10 minutes") if df.isStreaming else df
        return streaming_hll_overlap(
            win.withColumn("w", F.window("ts", "1 hour")).withColumn(
                "ws", F.col("w.start")
            ),
            ["ws", "g"],
            "k", "fa", "fb",
        )

    want = sorted(tuple(r) for r in transform(batch).collect())
    assert len({r[0] for r in want}) >= 4  # several hourly windows

    d = tempfile.mkdtemp(prefix="shllw_")
    ckpt = tempfile.mkdtemp(prefix="shllw_ck_")
    try:
        half = len(rows) // 2
        for i, chunk in enumerate((rows[:half], rows[half:]), 1):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                os.path.join(d, f"f{i}")
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "*"))
        )
        q = (
            transform(stream)
            .writeStream.format("memory")
            .queryName("shllw")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        final = {}
        for r in spark.table("shllw").collect():
            key = (r["ws"], r["g"])
            if r["n_union"] >= final.get(key, (0,))[0]:
                final[key] = (r["n_union"], r["n_a"], r["n_b"], r["n_inter"], r["jaccard"])
        got = sorted(
            (ws, g, v[1], v[2], v[0], v[3], v[4]) for (ws, g), v in final.items()
        )
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


# ---------------------------------------------------------------------------
# Round-14 staged family: watermarked windowed grouped sketch state.
# ---------------------------------------------------------------------------


def _run_windowed_audience(spark, chunks, tag, watermark="0 seconds"):
    """Replay chunk lists as one-file micro-batches through the
    watermarked windowed sketch builder (append mode) and return the
    finalized rows."""
    import os

    from meds_polars_functions_spark.streaming.events import (
        streaming_windowed_sketch_audience,
    )

    schema = "g string, k long, ts timestamp"
    d = tempfile.mkdtemp(prefix=f"wsa_{tag}_")
    ck = tempfile.mkdtemp(prefix=f"wsa_ck_{tag}_")
    try:
        for i, chunk in enumerate(chunks, 1):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                os.path.join(d, f"f{i}")
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "*"))
        )
        out = streaming_windowed_sketch_audience(
            stream, "ts", ["g"], "k", "1 day", watermark
        )
        q = (
            out.writeStream.format("memory")
            .queryName(f"wsa_{tag}")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.table(f"wsa_{tag}").collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


@pytest.mark.slow
def test_streaming_windowed_audience_finalizes_closed_windows_once(spark):
    """Append-mode contract of the watermarked windowed sketch state:
    every window whose end the final watermark passed is emitted
    EXACTLY once, with estimates equal to the batch build over the
    same rows (register merge across micro-batches is the monoid);
    the still-open last window is retained, not emitted."""
    from meds_polars_functions_spark.streaming.events import (
        streaming_windowed_sketch_audience,
    )

    t = dt.datetime
    chunks = [
        [("g", 1, t(2024, 1, 1, 5)), ("g", 2, t(2024, 1, 1, 6)),
         ("g", 1, t(2024, 1, 2, 5))],
        [("g", 3, t(2024, 1, 2, 9)), ("g", 4, t(2024, 1, 3, 12))],
    ]
    rows = _run_windowed_audience(spark, chunks, "fin")
    got = {(r["g"], r["window_start"].day): r["n_est"] for r in rows}
    # day 3 holds the max event time: its window never closes under a
    # 0-second watermark; days 1-2 finalize exactly once
    assert len(rows) == len(got) == 2
    assert got == {("g", 1): 2, ("g", 2): 2}
    # batch parity: the same expression on a batch frame, restricted to
    # the finalized windows
    batch = streaming_windowed_sketch_audience(
        spark.createDataFrame(
            [r for c in chunks for r in c], "g string, k long, ts timestamp"
        ),
        "ts",
        ["g"],
        "k",
        "1 day",
    )
    want = {
        (r["g"], r["window_start"].day): r["n_est"]
        for r in batch.collect()
        if r["window_start"].day < 3
    }
    assert got == want


@pytest.mark.slow
def test_streaming_windowed_audience_evicts_late_rows(spark):
    """Watermark EVICTION binds: a row arriving two micro-batches after
    its window closed (watermark moved past the window end in between)
    is dropped — the finalized window's estimate excludes it. This is
    the bounded-state guarantee: closed windows never reopen, so state
    is |open windows| x |groups|, not history."""
    t = dt.datetime
    chunks = [
        [("g", 1, t(2024, 1, 1, 5)), ("g", 2, t(2024, 1, 1, 6)),
         ("g", 1, t(2024, 1, 2, 5))],
        [("g", 3, t(2024, 1, 3, 12))],  # advances the watermark past day 1
        [("g", 99, t(2024, 1, 1, 7)),   # LATE: day-1 window already closed
         ("g", 4, t(2024, 1, 3, 13))],
    ]
    rows = _run_windowed_audience(spark, chunks, "late")
    got = {(r["g"], r["window_start"].day): r["n_est"] for r in rows}
    assert got[("g", 1)] == 2, "late key 99 must be evicted, not merged"
    assert got[("g", 2)] == 1
    assert ("g", 3) not in got  # still open


@pytest.mark.slow
def test_retention_close_composes_over_streamed_sketch_table(spark):
    """The family's composition claim: the retention close
    (sketch_window_retention_close — the SAME function the batch
    operator delegates to) over the sketch table the streaming builder
    emitted equals the batch windowed_sketch_retention over the
    non-late rows of the finalized windows."""
    from meds_polars_functions_spark.functions.sketches import (
        windowed_sketch_retention,
    )
    from meds_polars_functions_spark.streaming.events import (
        retention_from_sketch_windows,
        streaming_windowed_sketch_audience,
    )

    t = dt.datetime
    chunks = [
        [("g", 1, t(2024, 1, 1, 5)), ("g", 2, t(2024, 1, 1, 6)),
         ("g", 1, t(2024, 1, 2, 5)), ("g", 3, t(2024, 1, 2, 9))],
        [("g", 2, t(2024, 1, 3, 8)), ("g", 5, t(2024, 1, 3, 9)),
         ("g", 4, t(2024, 1, 4, 12))],
    ]
    emitted = _run_windowed_audience(spark, chunks, "comp")
    cells = spark.createDataFrame(
        emitted,
        "g string, window_start timestamp, audience_sketch binary, n_est long",
    )
    got = sorted(
        (r["g"], r["window_start"].day, r["n_prev"], r["n_cur"],
         r["n_union"], r["n_inter"], r["retention"])
        for r in retention_from_sketch_windows(cells, ["g"]).collect()
    )
    closed_days = {r["window_start"].day for r in emitted}
    batch = windowed_sketch_retention(
        spark.createDataFrame(
            [r for c in chunks for r in c], "g string, k long, ts timestamp"
        ).filter(F.dayofmonth("ts").isin(*closed_days)),
        "ts",
        ["g"],
        "k",
    )
    want = sorted(
        (r["g"], r["window_start"].day, r["n_prev"], r["n_cur"],
         r["n_union"], r["n_inter"], r["retention"])
        for r in batch.collect()
    )
    assert got == want and got, (got, want)
