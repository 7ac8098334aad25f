"""Structured Streaming variants of the event aggregations.

The reference is pure batch (SURVEY §2.10) — its only "streaming" is
Polars' out-of-core collect. These operators extend the engine to live
event feeds: the same aggregate expressions as
``operators.aggregate_code_metadata``, applied to an unbounded stream
with event-time watermarks. Because the stored stats are algebraic
(sums/counts/extrema — the reference's own re-aggregatable convention),
the streaming state per (window, code) is O(1) and windows finalize
exactly once the watermark passes.

Use: ``spark.readStream.schema(...).parquet(dir)`` (or kafka/rate) →
these transforms → ``writeStream`` with a checkpoint location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts with late-data
    tolerance. Works identically on batch DataFrames (watermark is a
    no-op there), which is how the correctness oracle exercises it."""
    is_streaming = stream.isStreaming
    if is_streaming:
        stream = stream.withWatermark(time_col, watermark_delay)
    win = F.window(time_col, window_duration, slide_duration or window_duration)
    # exact distinct in batch; streaming aggs don't support countDistinct,
    # so the stream path uses the HLL sketch (rsd 1% — exact on small
    # cardinalities, mergeable across state updates)
    n_users = (
        F.approx_count_distinct("user_id", rsd=0.01)
        if is_streaming
        else F.countDistinct("user_id")
    )
    return (
        stream.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_users.alias("n_users"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "n_users",
            "value_sum",
        )
    )


def streaming_code_metadata(
    stream: DataFrame,
    time_col: str = "time",
    watermark_delay: str = "1 hour",
    window_duration: str = "1 day",
) -> DataFrame:
    """Streaming flavor of aggregate_code_metadata: per (day-window, code)
    mergeable stats. Note countDistinct is not supported in update-mode
    streaming aggs — approx_count_distinct is the streaming-safe stand-in
    for code/n_patients."""
    val = F.col("numeric_value")
    present = val.isNotNull() & ~F.isnan(val)
    if stream.isStreaming:
        stream = stream.withWatermark(time_col, watermark_delay)
    return (
        stream.groupBy(F.window(time_col, window_duration).alias("win"), F.col("code"))
        .agg(
            F.approx_count_distinct("patient_id").alias("code/n_patients~"),
            F.count(F.lit(1)).alias("code/n_occurrences"),
            F.sum(F.when(present, val)).alias("values/sum"),
            F.sum(F.when(present, val * val)).alias("values/sum_sqd"),
            F.min(F.when(present, val)).alias("values/min"),
            F.max(F.when(present, val)).alias("values/max"),
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once keyed dedup for live feeds: on a stream,
    ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival of each
    key and bounds the dedup state by the watermark (state for a key is
    dropped once the watermark passes it — without the watermark bound,
    streaming dedup state grows forever and the job eventually OOMs; at
    100 TB/day of events this bound is the difference between a dedup
    that runs for months and one that dies in hours).

    On a batch DataFrame the same call degrades to plain
    ``dropDuplicates(key_cols)`` — which is how the batch-equivalence
    test pins the semantics (equal key sets; WHICH duplicate survives
    is arrival-order-dependent on the stream, exactly like the batch
    operator is partition-order-dependent, so only key-level equality
    is the contract)."""
    if stream.isStreaming:
        return stream.withWatermark(time_col, watermark_delay).dropDuplicatesWithinWatermark(
            key_cols
        )
    return stream.dropDuplicates(key_cols)


def streaming_hll_overlap(
    stream: DataFrame,
    group_cols: list[str],
    key_col: str,
    in_a_col: str,
    in_b_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Streaming twin of ``functions.sketches.hll_overlap_flags``: live
    per-group set-overlap estimates (``n_a, n_b, n_union, n_inter,
    jaccard``) over an unbounded feed, in update mode.

    Spark-first state design — NO custom stateful code: the three
    FILTER-ed ``hll_sketch_agg`` aggregates run inside the native
    streaming-aggregation operator, whose merge buffer IS the HLL
    register state (O(2^lgk) bytes per group, never O(events)). Because
    the registers are the SAME DataSketches state the batch path
    builds, the final per-group estimates equal
    ``hll_overlap_flags(all data)`` EXACTLY — not approximately —
    regardless of micro-batch split or order (register merge is a
    commutative monoid; pinned by the shuffled/reversed parity test).

    Contrast with the applyInPandasWithState suite (stateful.py): those
    ops need per-event ordering or custom emit logic; a mergeable
    sketch needs neither, so the declarative form is both simpler and
    exactly-parity. Works identically on a batch DataFrame (the
    aggregate is the same expression), which is how the parity oracle
    exercises it.

    No watermark: overlap is a running whole-history statistic (state
    is bounded by |groups| x 2^lgk regardless of retention). For
    windowed overlap, compose ``F.window`` into ``group_cols`` and add
    a watermark upstream — the aggregate itself is unchanged.
    """
    from meds_polars_functions_spark.functions.sketches import (
        _estimate_overlap,
        _require_identifiers,
    )

    _require_identifiers(
        "streaming_hll_overlap",
        key_col=key_col,
        in_a_col=in_a_col,
        in_b_col=in_b_col,
    )
    d = stream.filter(F.col(in_a_col) | F.col(in_b_col))
    agg = d.groupBy(*group_cols).agg(
        F.expr(
            f"hll_sketch_agg({key_col}, {lgk}) FILTER (WHERE {in_a_col})"
        ).alias("__ua__"),
        F.expr(
            f"hll_sketch_agg({key_col}, {lgk}) FILTER (WHERE {in_b_col})"
        ).alias("__ub__"),
        F.expr(f"hll_sketch_agg({key_col}, {lgk})").alias("__uu__"),
    )
    return _estimate_overlap(agg, list(group_cols))


def streaming_percentile_profile(
    stream: DataFrame,
    value_col: str,
    group_cols: list[str],
    percentiles: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Streaming twin of ``operators.profiles.approx_percentile_profile``
    (the round-13-registered GK-sketch quantile profile) — and
    deliberately a ONE-LINE delegation: the profile is a declarative
    aggregation, so on an unbounded feed the native streaming-agg
    operator keeps the Greenwald-Khanna summary as its merge buffer
    (O(1/eps log eps*n) per group) and update mode emits the current
    ``(group, percentile, n, approx_value)`` rows every batch. No
    custom state code, same expression batch and stream — the
    streaming_hll_overlap pattern.

    Parity contract (pinned by test): GK merge is order-sensitive in
    its retained samples, so interior answers may differ from the
    batch run by compression history — but every emitted answer
    satisfies the SAME rank guarantee
    (``operators.profiles.verify_percentile_profile`` holds against
    the full data), ``p0``/``p100`` are the exact extremes, and ``n``
    is the exact count. Running whole-history profile; for windowed
    profiles compose ``F.window`` into ``group_cols`` with an upstream
    watermark."""
    from meds_polars_functions_spark.operators.profiles import (
        approx_percentile_profile,
    )

    return approx_percentile_profile(
        stream, value_col, group_cols, percentiles, accuracy
    )


def streaming_windowed_sketch_audience(
    stream: DataFrame,
    ts_col: str,
    group_cols: list[str],
    key_col: str,
    window: str = "1 day",
    watermark_delay: str = "2 hours",
    lgk: int = 12,
) -> DataFrame:
    """Watermarked per-(group, tumbling window) distinct-audience sketch
    state over an unbounded feed — the round-14 staged family's
    streaming builder (§2.10): emits ``(*group_cols, window_start,
    audience_sketch, n_est)`` rows, one per finalized window in append
    mode.

    Spark-first state design (the SCALE.md mergeable-sketch lesson, now
    with EVICTION): the HLL registers live inside the native streaming
    aggregation buffer keyed by (group, window) — O(2^lgk) bytes per
    open window per group, NOT O(events) — and the watermark bounds how
    many windows stay open: state is |groups| x (window span covered by
    the watermark), constant for a steady feed, which is what lets a
    100 TB/day stream run for months. In append mode each window is
    emitted exactly once, when the watermark passes its end; rows later
    than the watermark are evicted by the engine (the documented
    declarative-aggregation trade: no ``dropped_events`` channel here,
    unlike the applyInPandasWithState suite — compose
    ``windowed_event_counts`` upstream when a drop count is needed).

    The emitted sketch column is the SAME DataSketches register state
    the batch :func:`~meds_polars_functions_spark.functions.sketches.
    windowed_sketch_retention` builds per window (register merge is a
    commutative monoid — batch parity is exact and pinned by test), so
    the retention close runs UNCHANGED over this op's output table:
    live window-over-window churn from bounded state, no raw-event
    replay. On a batch DataFrame the same call degrades to the plain
    windowed sketch build (no watermark), which is how the parity test
    pins the semantics."""
    from meds_polars_functions_spark.functions.sketches import (
        _require_identifiers,
    )

    _require_identifiers("streaming_windowed_sketch_audience", key_col=key_col)
    # ADVICE r14: lgk is f-string-spliced into SQL — coerce so a non-int
    # argument cannot become expression text.
    lgk = int(lgk)
    d = (
        stream.withWatermark(ts_col, watermark_delay)
        if stream.isStreaming
        else stream
    )
    return (
        d.groupBy(F.window(ts_col, window).alias("__w__"), *group_cols)
        .agg(F.expr(f"hll_sketch_agg({key_col}, {lgk})").alias("audience_sketch"))
        .select(
            *group_cols,
            F.col("__w__.start").alias("window_start"),
            "audience_sketch",
            F.expr("hll_sketch_estimate(audience_sketch)").alias("n_est"),
        )
    )


def retention_from_sketch_windows(
    cells: DataFrame,
    group_cols: list[str],
    window: str = "1 day",
    sketch_col: str = "audience_sketch",
) -> DataFrame:
    """Window-over-window retention close over an already-built
    per-(group, window) sketch table — e.g. the accumulated output of
    :func:`streaming_windowed_sketch_audience`, or any stored sketch
    state partitioned by window. Pure metadata-sized algebra (the
    window-shift stack + FILTER-ed ``hll_union_agg``), no raw corpus
    anywhere; same output shape as ``windowed_sketch_retention`` minus
    the corpus pass it never needs. Thin delegation — the close IS
    functions.sketches.sketch_window_retention_close, shared with the
    batch operator so batch and stream provably run the same algebra."""
    from meds_polars_functions_spark.functions.sketches import (
        sketch_window_retention_close,
    )

    return sketch_window_retention_close(cells, group_cols, window, sketch_col)
