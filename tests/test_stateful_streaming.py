"""applyInPandasWithState operators driven through a real multi-batch
stream (maxFilesPerTrigger=1 forces one micro-batch per input file, so
state genuinely carries across batches)."""

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

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def two_batch_dir(spark):
    d = tempfile.mkdtemp(prefix="batches_")
    b1 = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 7, "click", 1.0, None),
        (2, dt.datetime(2024, 1, 1, 10, 1), 7, "view", 5.0, None),
        (3, dt.datetime(2024, 1, 1, 10, 2), 9, "click", 2.0, None),
    ]
    b2 = [
        (4, dt.datetime(2024, 1, 1, 11, 0), 7, "click", 10.0, None),
        (5, dt.datetime(2024, 1, 1, 11, 1), 9, "purchase", 4.0, None),
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(os.path.join(d, "f1"))
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(os.path.join(d, "f2"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, src_dir, transform, name, output_mode="update"):
    schema = spark.read.parquet(os.path.join(src_dir, "f1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "*"))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table(name).collect()
    shutil.rmtree(ckpt, ignore_errors=True)
    return rows


def test_running_stats_accumulate_across_batches(spark, two_batch_dir):
    rows = _run(spark, two_batch_dir, streaming_running_stats, "running_stats_out")
    by_key = {}
    for r in rows:  # last update per key wins
        cur = by_key.get(r["key"])
        if cur is None or r["total_events"] > cur["total_events"]:
            by_key[r["key"]] = r
    assert by_key[7]["total_events"] == 3
    assert by_key[7]["total_sum"] == pytest.approx(16.0)
    assert by_key[7]["running_max"] == pytest.approx(10.0)
    assert by_key[9]["total_events"] == 2
    assert by_key[9]["total_sum"] == pytest.approx(6.0)
    # state really crossed batches: some update shows batch < total
    assert any(r["batch_events"] < r["total_events"] for r in rows)


def test_first_seen_dedup(spark, two_batch_dir):
    rows = _run(spark, two_batch_dir, streaming_first_seen_dedup, "dedup_out")
    emitted = {(r["key"], r["content"]) for r in rows}
    # user 7's second 'click' (batch 2) must NOT re-emit
    assert emitted == {(7, "click"), (7, "view"), (9, "click"), (9, "purchase")}
    assert len(rows) == 4


@pytest.mark.slow
def test_dedup_within_watermark_drops_cross_batch_dupes(spark):
    import datetime as dt

    from meds_polars_functions_spark.streaming.stateful import (
        streaming_dedup_within_watermark,
    )

    d = tempfile.mkdtemp(prefix="wmdedup_")
    b1 = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 7, "click", 1.0, None),
        (2, dt.datetime(2024, 1, 1, 10, 1), 7, "view", 5.0, None),
    ]
    b2 = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 7, "click", 1.0, None),  # dupe
        (3, dt.datetime(2024, 1, 1, 10, 5), 9, "click", 2.0, None),
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(os.path.join(d, "f1"))
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(os.path.join(d, "f2"))
    try:
        schema = spark.read.parquet(os.path.join(d, "f1")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "*"))
        )
        ckpt = tempfile.mkdtemp(prefix="ckpt_")
        q = (
            streaming_dedup_within_watermark(stream)
            .writeStream.format("memory")
            .queryName("wm_dedup_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.table("wm_dedup_out").collect()
        assert sorted(r["event_id"] for r in rows) == [1, 2, 3]
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_static_broadcast_enrich(spark):
    """Stream-static join: a streaming fact enriched against a static
    dimension joins per micro-batch with the dim broadcast — the
    streaming form of the engine's broadcast-dimension invariant."""
    import datetime as dt

    d = tempfile.mkdtemp(prefix="ss_enrich_")
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 7, "click", 1.0, None),
        (2, dt.datetime(2024, 1, 1, 10, 1), 9, "view", 5.0, None),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(os.path.join(d, "f1"))
    dim = spark.createDataFrame([(7, "gold"), (9, "basic")], ["user_id", "tier"])
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        schema = spark.read.parquet(os.path.join(d, "f1")).schema
        stream = spark.readStream.schema(schema).parquet(os.path.join(d, "*"))
        from pyspark.sql import functions as F

        q = (
            stream.join(F.broadcast(dim), "user_id")
            .writeStream.format("memory")
            .queryName("ss_enrich_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {(r["event_id"], r["tier"]) for r in spark.table("ss_enrich_out").collect()}
        assert got == {(1, "gold"), (2, "basic")}
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.fixture()
def funnel_batch_dir(spark):
    d = tempfile.mkdtemp(prefix="funnel_batches_")
    h = dt.datetime(2024, 1, 1, 10, 0)
    m = dt.timedelta(minutes=1)
    b1 = [
        (1, h, 7, "view", 1.0, None),        # u7 starts a chain
        (2, h, 8, "view", 1.0, None),        # u8 starts a chain
        (3, h, 9, "view", 1.0, None),        # u9: view at ts T...
    ]
    b2 = [
        (4, h + 30 * m, 7, "click", 1.0, None),   # u7 level 2 (in window)
        (5, h, 9, "click", 1.0, None),            # u9: click at the SAME ts
                                                  # across batches -> no chain
        (6, h + 120 * m, 8, "click", 1.0, None),  # u8: outside 1 h window
    ]
    b3 = [
        (7, h + 45 * m, 7, "purchase", 1.0, None),  # u7 level 3
        (8, h + 46 * m, 9, "purchase", 1.0, None),  # u9 stays 1 (no click'd)
    ]
    for i, b in enumerate((b1, b2, b3), 1):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _last_per_user(rows):
    out = {}
    for r in rows:  # update mode: the row with the most events seen wins
        cur = out.get(r["user_id"])
        if cur is None or r["events_seen"] >= cur["events_seen"]:
            out[r["user_id"]] = r
    return {u: r["funnel_level"] for u, r in out.items()}


def test_streaming_funnel_levels_across_batches(spark, funnel_batch_dir):
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_funnel_levels,
    )

    rows = _run(
        spark,
        funnel_batch_dir,
        lambda s: streaming_funnel_levels(
            s, ["view", "click", "purchase"], window=3_600_000_000
        ),
        "funnel_stream_out",
    )
    assert _last_per_user(rows) == {7: 3, 8: 1, 9: 1}
    # state really crossed batches: u7's chain completes only in batch 3
    u7 = sorted(
        (r["events_seen"], r["funnel_level"]) for r in rows if r["user_id"] == 7
    )
    assert u7 == [(1, 1), (2, 2), (3, 3)]
    # the fixture feeds batches in timestamp order (ties included), so
    # the in-order contract holds and nothing is dropped
    assert all(r["dropped_events"] == 0 for r in rows)


@pytest.mark.slow
def test_streaming_funnel_custom_user_col_name_and_type(spark, funnel_batch_dir):
    """ADVICE r11: the output user column must carry user_col's NAME and
    the input schema's TYPE — a string-keyed rename previously collided
    with a hardcoded ``user_id: long`` output field."""
    from pyspark.sql import functions as F

    from meds_polars_functions_spark.streaming.stateful import (
        streaming_funnel_levels,
    )

    rows = _run(
        spark,
        funnel_batch_dir,
        lambda s: streaming_funnel_levels(
            s.withColumn("uid", F.concat(F.lit("u"), F.col("user_id"))),
            ["view", "click", "purchase"],
            window=3_600_000_000,
            user_col="uid",
        ),
        "funnel_uid_out",
    )
    assert rows and isinstance(rows[0]["uid"], str)
    last = {}
    for r in rows:
        cur = last.get(r["uid"])
        if cur is None or r["events_seen"] >= cur["events_seen"]:
            last[r["uid"]] = r
    assert {u: r["funnel_level"] for u, r in last.items()} == {
        "u7": 3, "u8": 1, "u9": 1
    }


@pytest.mark.slow
def test_streaming_funnel_reports_dropped_out_of_order(spark):
    """ADVICE r11: events strictly below a user's high-water mark are
    beyond the forward-only DP's replay and are dropped — the drop must
    be VISIBLE via dropped_events (it still counts in events_seen), so
    consumers can detect a violated in-order contract."""
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_funnel_levels,
    )

    d = tempfile.mkdtemp(prefix="funnel_ooo_")
    h = dt.datetime(2024, 1, 1, 10, 0)
    m = dt.timedelta(minutes=1)
    b1 = [(1, h + 10 * m, 7, "click", 1.0, None)]  # tmax -> h+10m
    b2 = [(2, h, 7, "view", 1.0, None)]  # strictly below tmax: dropped
    for i, b in enumerate((b1, b2), 1):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
    try:
        rows = _run(
            spark,
            d,
            lambda s: streaming_funnel_levels(
                s, ["view", "click", "purchase"], window=3_600_000_000
            ),
            "funnel_ooo_out",
        )
        final = max(
            (r for r in rows if r["user_id"] == 7),
            key=lambda r: r["events_seen"],
        )
        assert final["events_seen"] == 2
        assert final["dropped_events"] == 1
        assert final["funnel_level"] == 0  # the late view never replays
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_streaming_funnel_matches_batch_on_driver_events(spark):
    """stream≡batch parity: the sf0.001 events table split into three
    timestamp-ordered micro-batches must land every user on exactly the
    batch operator's funnel level."""
    from meds_polars_functions_spark.operators.funnel import window_funnel
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_funnel_levels,
    )
    from pyspark.sql import functions as F

    steps, W = ["view", "click", "purchase"], 6 * 3_600_000_000
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    want = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(ev, steps, window=W).collect()
    }

    d = tempfile.mkdtemp(prefix="funnel_parity_")
    try:
        ordered = ev.orderBy("ts").collect()
        cut = len(ordered) // 3
        for i, chunk in enumerate(
            (ordered[:cut], ordered[cut : 2 * cut], ordered[2 * cut :]), 1
        ):
            spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
                os.path.join(d, f"f{i}")
            )
        rows = _run(
            spark,
            d,
            lambda s: streaming_funnel_levels(s, steps, window=W),
            "funnel_parity_out",
        )
        assert _last_per_user(rows) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_streaming_touch_credits_emit_on_close(spark):
    """Credits emit exactly when a converting session CLOSES (a later
    event beyond the gap): mid-batch closes, cross-batch closes, silent
    close of an unconverted session, and withheld credit for the final
    (still-open) session."""
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_touch_credits,
    )

    d = tempfile.mkdtemp(prefix="touch_stream_")
    h = dt.datetime(2024, 1, 1, 10, 0)
    m = dt.timedelta(minutes=1)
    GAP = 3600 * 1_000_000  # 1 h
    b1 = [
        (1, h, 7, "view", 1.0, None),
        (2, h + 10 * m, 7, "purchase", 1.0, None),  # converts (ft=view, lt=view)
        (3, h, 8, "click", 1.0, None),  # session never converts
    ]
    b2 = [
        # 100 min > gap after (2): closes u7 session 1 -> credit emitted
        (4, h + 110 * m, 7, "purchase", 1.0, None),  # opens s2, direct
        (5, h + 110 * m, 8, "click", 1.0, None),  # closes u8 s1 silently
    ]
    b3 = [
        # closes u7 session 2 -> (direct, direct); opens s3 (never closes)
        (6, h + 300 * m, 7, "view", 1.0, None),
    ]
    for i, b in enumerate((b1, b2, b3), 1):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
    try:
        rows = _run(
            spark,
            d,
            lambda s: streaming_touch_credits(s, gap=GAP),
            "touch_stream_out",
            output_mode="append",
        )
        got = sorted(
            (r["user_id"], r["session_id"], r["first_touch"], r["last_touch"])
            for r in rows
        )
        assert got == [(7, 1, "view", "view"), (7, 2, "(direct)", "(direct)")]
        assert all(r["dropped_events"] == 0 for r in rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_streaming_touch_credits_match_batch_on_driver_events(spark):
    """stream≡batch parity: the sf0.001 events table split into three
    timestamp-ordered micro-batches must emit exactly the batch
    operator's per-session credits for every CLOSED session (all but
    each user's final session, which is still open when the stream
    drains)."""
    from pyspark.sql import functions as F

    from meds_polars_functions_spark.operators.attribution import (
        assign_sessions,
        session_credits,
    )
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_touch_credits,
    )

    GAP = 6 * 3600 * 1_000_000
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    last_sid = assign_sessions(ev, GAP).groupBy("user_id").agg(
        F.max("__sid").alias("__last")
    )
    want = sorted(
        (r["user_id"], r["__sid"], r["first_touch"], r["last_touch"])
        for r in session_credits(ev, GAP)
        .join(last_sid, "user_id")
        .filter(F.col("__sid") < F.col("__last"))
        .collect()
    )
    assert len(want) > 50  # the parity set is substantial, not vacuous

    d = tempfile.mkdtemp(prefix="touch_parity_")
    try:
        ordered = ev.orderBy("ts", "event_id").collect()
        cut = len(ordered) // 3
        for i, chunk in enumerate(
            (ordered[:cut], ordered[cut : 2 * cut], ordered[2 * cut :]), 1
        ):
            spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
                os.path.join(d, f"f{i}")
            )
        rows = _run(
            spark,
            d,
            lambda s: streaming_touch_credits(s, gap=GAP),
            "touch_parity_out",
            output_mode="append",
        )
        got = sorted(
            (r["user_id"], r["session_id"], r["first_touch"], r["last_touch"])
            for r in rows
        )
        assert got == want
        assert all(r["dropped_events"] == 0 for r in rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_streaming_touch_credits_status_row_on_silent_drop(spark):
    """ADVICE r12: drops accrued in a batch that closes no converting
    session must still surface IN THAT BATCH — as a status row
    (session_id/touches NULL, dropped_events = cumulative) — so a
    consumer asserting the in-order contract sees the violation even if
    the user never converts again. The eventual credit row then carries
    the same cumulative count."""
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_touch_credits,
    )

    d = tempfile.mkdtemp(prefix="touch_drop_")
    h = dt.datetime(2024, 1, 1, 10, 0)
    m = dt.timedelta(minutes=1)
    GAP = 3600 * 1_000_000  # 1 h
    b1 = [
        (1, h, 7, "view", 1.0, None),
        (2, h + 5 * m, 7, "purchase", 1.0, None),  # converts s1 (open)
    ]
    b2 = [
        # below u7's high-water mark: dropped; closes nothing -> the
        # batch would emit no rows without the status row
        (3, h - 60 * m, 7, "click", 1.0, None),
    ]
    b3 = [
        # 115 min > gap: closes s1 -> credit row, cumulative dropped=1
        (4, h + 120 * m, 7, "view", 1.0, None),
    ]
    for i, b in enumerate((b1, b2, b3), 1):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
    try:
        rows = _run(
            spark,
            d,
            lambda s: streaming_touch_credits(s, gap=GAP),
            "touch_drop_out",
            output_mode="append",
        )
        status = [r for r in rows if r["session_id"] is None]
        credits = [r for r in rows if r["session_id"] is not None]
        assert len(status) == 1
        assert status[0]["user_id"] == 7
        assert status[0]["first_touch"] is None
        assert status[0]["last_touch"] is None
        assert status[0]["dropped_events"] == 1
        assert [
            (r["user_id"], r["session_id"], r["first_touch"],
             r["last_touch"], r["dropped_events"])
            for r in credits
        ] == [(7, 1, "view", "view", 1)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_binned_quantiles_hand_computed(spark):
    """Two batches into one group: 10 values 0..9 with lo=0, hi=10,
    n_bins=10 — every bin holds one value, so the q-quantile estimate
    is the upper edge of bin ceil(q*10)-1. Estimates update across
    batches and n_seen accumulates."""
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_binned_quantiles,
    )

    d = tempfile.mkdtemp(prefix="sbq_hand_")
    h = dt.datetime(2024, 1, 1, 10, 0)
    b1 = [(i, h, 7, "x", float(i), None) for i in range(5)]
    b2 = [(i + 5, h, 7, "x", float(i + 5), None) for i in range(5)]
    for i, b in enumerate((b1, b2), 1):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
    try:
        rows = _run(
            spark,
            d,
            lambda s: streaming_binned_quantiles(
                s, "value", "event_type", qs=(0.5, 1.0), lo=0.0, hi=10.0,
                n_bins=10,
            ),
            "sbq_hand_out",
        )
        final = {}
        for r in rows:
            if r["n_seen"] >= final.get(r["q"], (0, None))[0]:
                final[r["q"]] = (r["n_seen"], r["est"])
        # after 10 values 0..9: median bin = first with cum >= 5 -> bin
        # 4 (values 0-4), upper edge 5.0; q=1.0 -> bin 9, edge 10.0
        assert final == {0.5: (10, 5.0), 1.0: (10, 10.0)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_streaming_binned_quantiles_match_batch_any_order(spark):
    """stream≡batch parity WITHOUT an in-order contract: the sf0.001
    events table split into three SHUFFLED micro-batches (seeded
    permutation — deliberately not timestamp order) must land every
    (event_type, q) on exactly the batch
    binned_quantiles(binned_histogram(...)) estimate, because bin
    counts commute. A reversed batch order gives the same final
    answer."""
    import random

    from pyspark.sql import functions as F

    from meds_polars_functions_spark.functions.sketches import (
        binned_histogram,
        binned_quantiles,
    )
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_binned_quantiles,
    )

    QS, LO, HI, NB = (0.5, 0.9, 0.99), 0.0, 500.0, 200
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    hist = binned_histogram(ev, "value", ["event_type"], LO, HI, NB)
    want = {
        (r["event_type"], r["q"]): r["est"]
        for r in binned_quantiles(
            hist, QS, ["event_type"], LO, HI, NB
        ).collect()
    }
    n_want = {
        r["event_type"]: r["n"]
        for r in hist.groupBy("event_type")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    }
    assert len(want) == 15  # 5 types x 3 qs

    rows_all = ev.collect()
    rng = random.Random(3)
    rng.shuffle(rows_all)
    cut = len(rows_all) // 3
    chunks = [rows_all[:cut], rows_all[cut : 2 * cut], rows_all[2 * cut :]]

    def run_order(chunks, tag):
        d = tempfile.mkdtemp(prefix=f"sbq_{tag}_")
        try:
            for i, chunk in enumerate(chunks, 1):
                spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
                    os.path.join(d, f"f{i}")
                )
            rows = _run(
                spark,
                d,
                lambda s: streaming_binned_quantiles(
                    s, "value", "event_type", qs=QS, lo=LO, hi=HI, n_bins=NB
                ),
                f"sbq_{tag}_out",
            )
            final = {}
            for r in rows:
                k = (r["event_type"], r["q"])
                if r["n_seen"] >= final.get(k, (0, None))[0]:
                    final[k] = (r["n_seen"], r["est"])
            return final
        finally:
            shutil.rmtree(d, ignore_errors=True)

    fwd = run_order(chunks, "fwd")
    assert {k: v[1] for k, v in fwd.items()} == want
    assert all(fwd[(g, q)][0] == n_want[g] for g, q in fwd)
    rev = run_order(chunks[::-1], "rev")
    assert rev == fwd  # order independence


def test_streaming_binned_quantiles_args_and_group_typing(spark):
    """Invalid args raise; the output group column carries group_col's
    name and the input type (the ADVICE r11 rule)."""
    from pyspark.sql import functions as F

    from meds_polars_functions_spark.streaming.stateful import (
        streaming_binned_quantiles,
    )

    df = spark.createDataFrame([(1, "a", 1.0)], "i long, g string, value double")
    with pytest.raises(ValueError):
        streaming_binned_quantiles(df, "value", "g", n_bins=0)
    with pytest.raises(ValueError):
        streaming_binned_quantiles(df, "value", "g", qs=(0.0,))
    with pytest.raises(ValueError):
        streaming_binned_quantiles(df, "value", "g", lo=1.0, hi=1.0)
    d = tempfile.mkdtemp(prefix="sbq_typ_")
    h = dt.datetime(2024, 1, 1, 10, 0)
    b1 = [(1, h, 7, "x", 3.0, None)]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(
        os.path.join(d, "f1")
    )
    try:
        rows = _run(
            spark,
            d,
            lambda s: streaming_binned_quantiles(
                s.withColumn("uid", F.concat(F.lit("u"), F.col("user_id"))),
                "value", "uid", qs=(0.5,), lo=0.0, hi=10.0, n_bins=10,
            ),
            "sbq_typ_out",
        )
        assert rows and isinstance(rows[0]["uid"], str) and rows[0]["uid"] == "u7"
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_streaming_binned_quantiles_nan_and_null_match_batch(spark):
    """ADVICE r12: NULL is excluded (like binned_histogram's isNotNull)
    and counted in dropped_events; a true double NaN is NOT dropped —
    it lands in bin 0, exactly what the batch floor->long->clamp path
    computes (verified under both ANSI modes). Feed: batch 1 = {NaN,
    2.5}, batch 2 = {NULL, 7.5}. Batch oracle over the same rows gives
    the expected estimates; the stream must equal it and report
    dropped_events == 1 (the NULL)."""
    from pyspark.sql import functions as F

    from meds_polars_functions_spark.functions.sketches import (
        binned_histogram,
        binned_quantiles,
    )
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_binned_quantiles,
    )

    QS, LO, HI, NB = (0.5, 1.0), 0.0, 10.0, 10
    h = dt.datetime(2024, 1, 1, 10, 0)
    b1 = [(1, h, 7, "x", float("nan"), None), (2, h, 7, "x", 2.5, None)]
    b2 = [(3, h, 7, "x", None, None), (4, h, 7, "x", 7.5, None)]

    batch_df = spark.createDataFrame(b1 + b2, SCHEMA)
    want = {
        (r["event_type"], r["q"]): r["est"]
        for r in binned_quantiles(
            binned_histogram(batch_df, "value", ["event_type"], LO, HI, NB),
            QS, ["event_type"], LO, HI, NB,
        ).collect()
    }
    # sanity on the oracle itself: NaN -> bin 0 makes the median the
    # bin-2 upper edge (3 values: bins 0, 2, 7 -> cum>=1.5 at bin 2)
    assert want == {("x", 0.5): 3.0, ("x", 1.0): 8.0}

    d = tempfile.mkdtemp(prefix="sbq_nan_")
    try:
        for i, b in enumerate((b1, b2), 1):
            spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
                os.path.join(d, f"f{i}")
            )
        rows = _run(
            spark,
            d,
            lambda s: streaming_binned_quantiles(
                s, "value", "event_type", qs=QS, lo=LO, hi=HI, n_bins=NB
            ),
            "sbq_nan_out",
        )
        final = {}
        for r in rows:
            k = (r["event_type"], r["q"])
            if r["n_seen"] >= final.get(k, (0, None, 0))[0]:
                final[k] = (r["n_seen"], r["est"], r["dropped_events"])
        assert {k: v[1] for k, v in final.items()} == want
        # n_seen counts sketched values (NaN included, NULL not);
        # dropped_events surfaces the NULL exclusion
        assert all(v[0] == 3 and v[2] == 1 for v in final.values())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_binned_quantiles_null_only_batch_surfaces_drops(spark):
    """A micro-batch of only NULLs for a fresh group must still emit a
    drops-visible row (q/est null, n_seen 0, dropped_events > 0) — the
    touch-credits ADVICE r12 precedent: exclusions may never be
    invisible just because nothing else happened."""
    from meds_polars_functions_spark.streaming.stateful import (
        streaming_binned_quantiles,
    )

    h = dt.datetime(2024, 1, 1, 10, 0)
    d = tempfile.mkdtemp(prefix="sbq_nullonly_")
    try:
        spark.createDataFrame(
            [(1, h, 7, "x", None, None), (2, h, 7, "x", None, None)], SCHEMA
        ).coalesce(1).write.parquet(os.path.join(d, "f1"))
        rows = _run(
            spark,
            d,
            lambda s: streaming_binned_quantiles(
                s, "value", "event_type", qs=(0.5,), lo=0.0, hi=10.0, n_bins=10
            ),
            "sbq_nullonly_out",
        )
        assert [
            (r["event_type"], r["q"], r["est"], r["n_seen"], r["dropped_events"])
            for r in rows
        ] == [("x", None, None, 0, 2)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_binned_quantiles_reserved_isnull_column_raises(spark):
    from pyspark.sql import functions as F

    from meds_polars_functions_spark.streaming.stateful import (
        streaming_binned_quantiles,
    )

    df = spark.createDataFrame([(1.0, "g")], "value double, g string")
    with pytest.raises(ValueError, match="__isnull__"):
        streaming_binned_quantiles(
            df.withColumn("__isnull__", F.lit(False)), "value", "g"
        )


def test_stateful_ops_share_drops_visible_convention():
    """VERDICT r12 item 5: ONE shared convention — every stateful
    streaming operator here exposes a cumulative ``dropped_events``
    LongType column in its output schema so a consumer can assert zero
    silent exclusions uniformly (funnel/touch: in-order contract;
    binned quantiles: NULL exclusion). Schema-level pin; the value
    semantics are pinned by each operator's own tests above."""
    import inspect

    from meds_polars_functions_spark.streaming import stateful as S

    for fn in (
        S.streaming_funnel_levels,
        S.streaming_touch_credits,
        S.streaming_binned_quantiles,
    ):
        src = inspect.getsource(fn)
        assert '"dropped_events"' in src and "LongType()" in src, fn.__name__
        assert "dropped_events" in (fn.__doc__ or ""), fn.__name__
