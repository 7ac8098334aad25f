"""Custom stateful streaming operators via ``applyInPandasWithState``.

These cover semantics Spark's built-in streaming aggregations cannot
express: state that must persist across micro-batches with per-group
custom transition logic. State is kept per group key in the state store
(RocksDB/HDFS-backed on a cluster), so memory is O(active keys), not
O(events).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout


def streaming_running_stats(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    time_col: str = "ts",
) -> DataFrame:
    """Per-key lifetime running stats, updated each micro-batch.

    Emits one row per (key, batch): events seen this batch plus the
    accumulated count/sum/max since stream start. The accumulator is the
    mergeable-stats convention again (store count+sum, derive mean), so
    state is three scalars per key forever — no event retention.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("batch_events", T.LongType()),
            T.StructField("total_events", T.LongType()),
            T.StructField("total_sum", T.DoubleType()),
            T.StructField("running_max", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("count", T.LongType()),
            T.StructField("sum", T.DoubleType()),
            T.StructField("max", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        (k,) = key
        batch_n, batch_sum, batch_max = 0, 0.0, float("-inf")
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            batch_n += len(pdf)
            batch_sum += float(vals.sum())
            if len(vals):
                batch_max = max(batch_max, float(vals.max()))
        if state.exists:
            count, total, mx = state.get
        else:
            count, total, mx = 0, 0.0, float("-inf")
        count += batch_n
        total += batch_sum
        mx = max(mx, batch_max)
        state.update((count, total, mx))
        yield pd.DataFrame(
            {
                "key": [k],
                "batch_events": [batch_n],
                "total_events": [count],
                "total_sum": [total],
                "running_max": [None if mx == float("-inf") else mx],
            }
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_first_seen_dedup(
    events: DataFrame,
    key_col: str = "user_id",
    content_col: str = "event_type",
) -> DataFrame:
    """Streaming exact dedup with unbounded memory of what was seen:
    emit an event only the FIRST time its (key, content) appears in the
    stream's lifetime. Built-in ``dropDuplicates`` on a stream needs a
    watermark and forgets; this keeps a compact per-key seen-set of
    64-bit content digests in the state store (32-bit hashes hit
    birthday collisions around ~77k distinct values per key and would
    silently drop fresh events).
    """
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("content", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("seen", T.ArrayType(T.LongType()))]
    )

    def digest(c) -> int:
        h = hashlib.blake2b(str(c).encode(), digest_size=8).digest()
        return int.from_bytes(h, "big", signed=True)

    def update(key, pdfs, state):
        import pandas as pd

        (k,) = key
        seen = set(state.get[0]) if state.exists else set()
        fresh = []
        for pdf in pdfs:
            for c in pdf[content_col]:
                h = digest(c)
                if h not in seen:
                    seen.add(h)
                    fresh.append(c)
        state.update((sorted(seen),))
        yield pd.DataFrame({"key": [k] * len(fresh), "content": fresh})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Native bounded-state streaming dedup: emit each key's FIRST
    arrival, drop re-arrivals within the watermark horizon, and — the
    part plain ``dropDuplicates`` on a stream cannot do — EXPIRE state
    once the watermark passes, so state size tracks the late-data bound
    instead of growing with total distinct keys forever. This is the
    production form of the first-seen dedup above for the common case
    (exact key, bounded lateness); the applyInPandasWithState variant
    remains the escape hatch for custom digests/TTL policies."""
    keys = keys or ["event_id"]
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def streaming_funnel_levels(
    events: DataFrame,
    steps: list[str],
    window: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming form of ``operators.funnel.window_funnel``: per-user
    funnel level maintained incrementally across micro-batches, one
    ``(<user_col>, funnel_level, events_seen, dropped_events)`` row per
    (user, batch) — the user column keeps its input name and type
    (ADVICE r11: a string-keyed or renamed user column previously hit a
    hardcoded ``user_id: long`` output field).

    The batch DP's whole state is O(k) per user — for each level the
    best (latest) chain-start timestamp — so it streams exactly:

    - ``lt[i]``: max start over chains reaching level i+1 whose LAST
      event is strictly before the high-water mark ``tmax`` (these are
      extendable by any event at ``ts >= tmax``);
    - ``eq[i]``: same but last event AT ``tmax`` (extendable only once
      the clock strictly advances — this is the strict-< tie rule the
      batch operator enforces with its RANGE -1 frame, carried across
      micro-batch boundaries).

    Advancing ``tmax`` folds ``eq`` into ``lt``. Within a batch events
    are sorted by timestamp and processed in tie groups against ``lt``
    only, which is the batch operator's two-phase tie semantics.

    In-order contract: an event with ``ts`` strictly below the user's
    high-water mark arrived out of order beyond what the state can
    replay (the DP is forward-only); it is counted in ``events_seen``
    AND in the ``dropped_events`` output column (ADVICE r11: silent
    drops made stream/batch divergence on unordered feeds invisible —
    a consumer asserting ``dropped_events == 0`` now gets an exact
    in-order-contract check). Feed batches in timestamp order (the
    stream≡batch parity test does) or pre-sort within the allowed
    lateness upstream. State never retains events, so a user's state is
    ~2k+4 longs forever — RocksDB-friendly at any corpus size.

    Share the JVM front-end with the batch operator (pushed isin step
    filter, µs normalization) so both see identical inputs.
    """
    from meds_polars_functions_spark.operators.funnel import funnel_events

    k = len(steps)
    if window < 0:
        raise ValueError("window must be >= 0 microseconds")
    NEG = -(1 << 62)

    prepared = funnel_events(events, steps, user_col, ts_col, type_col)
    out_schema = T.StructType(
        [
            T.StructField(user_col, prepared.schema[user_col].dataType),
            T.StructField("funnel_level", T.IntegerType()),
            T.StructField("events_seen", T.LongType()),
            T.StructField("dropped_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("tmax", T.LongType()),
            T.StructField("lt", T.ArrayType(T.LongType())),
            T.StructField("eq", T.ArrayType(T.LongType())),
            T.StructField("level", T.IntegerType()),
            T.StructField("seen", T.LongType()),
            T.StructField("dropped", T.LongType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        (u,) = key
        if state.exists:
            tmax, lt, eq, level, seen, dropped = state.get
            lt, eq = list(lt), list(eq)
        else:
            tmax, lt, eq, level, seen, dropped = NEG, [NEG] * k, [NEG] * k, 0, 0, 0

        frames = [pdf[["__tu", "__step"]] for pdf in pdfs if len(pdf)]
        if frames:
            allr = pd.concat(frames).sort_values("__tu", kind="stable")
            seen += len(allr)
            for t, grp in allr.groupby("__tu", sort=True):
                t = int(t)
                if t < tmax:
                    dropped += len(grp)  # out of order below the high-water mark
                    continue
                if t > tmax:
                    lt = [max(a, b) for a, b in zip(lt, eq)]
                    eq = [NEG] * k
                    tmax = t
                for s in grp["__step"]:
                    s = int(s)
                    if s == 1:
                        cand = t
                    else:
                        prev = lt[s - 2]
                        cand = prev if (prev != NEG and t - prev <= window) else NEG
                    if cand != NEG and cand > eq[s - 1]:
                        eq[s - 1] = cand
                        if s > level:
                            level = s

        state.update((tmax, lt, eq, level, seen, dropped))
        yield pd.DataFrame(
            {
                user_col: [u],
                "funnel_level": [level],
                "events_seen": [seen],
                "dropped_events": [dropped],
            }
        )

    return prepared.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_touch_credits(
    events: DataFrame,
    gap: int,
    conversion: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming form of ``operators.attribution.session_credits``:
    per-user gap sessionization maintained incrementally across
    micro-batches, emitting one ``(<user_col>, session_id, first_touch,
    last_touch)`` row the moment a CONVERTING session CLOSES (a later
    event of the same user arrives more than ``gap`` µs after it).

    The session DP's whole state is O(1) per user — the open session's
    high-water timestamp, opening channel, most-recent channel, and the
    (first_touch, last_touch) pair frozen at its first conversion — so
    it streams exactly; no events are retained. An open session is by
    definition still extendable, so its credit is withheld until the
    close (in production add an idle timeout upstream if final-session
    credits must flush; the batch operator is the source of truth for
    a bounded corpus).

    In-order contract (same as ``streaming_funnel_levels``): an event
    strictly below the user's high-water mark cannot be replayed into
    already-folded session state; it is dropped and counted in the
    ``dropped_events`` output column. Events AT the high-water mark are
    processed (ties ordered by ``(ts, id)`` within a batch; across
    batches, arrival order stands in for the id tiebreak — feed ties in
    id order to match the batch operator exactly).

    Drop VISIBILITY (ADVICE r12: credit rows only emit when a
    converting session closes, so drops accrued in a batch that closes
    nothing could stay invisible — forever, if the user never converts
    again): any batch whose folding increments a user's drop counter
    without emitting a credit row emits one STATUS row instead —
    ``session_id``/``first_touch``/``last_touch`` all NULL,
    ``dropped_events`` = the new cumulative count. A consumer asserting
    the in-order contract (``dropped_events == 0``) therefore sees
    every violation in the violating batch; consumers of credits filter
    ``session_id IS NOT NULL``. In-order feeds never produce status
    rows, so the batch-parity contract is unchanged.

    Shares ``attribution_events`` with the batch operator so both see
    identical (user, µs, id, type) inputs.
    """
    from meds_polars_functions_spark.operators.attribution import (
        DIRECT_CHANNEL,
        attribution_events,
    )

    if gap < 0:
        raise ValueError("gap must be >= 0 microseconds")
    NEG = -(1 << 62)

    prepared = attribution_events(events, user_col, ts_col, id_col, type_col)
    out_schema = T.StructType(
        [
            T.StructField(user_col, prepared.schema[user_col].dataType),
            T.StructField("session_id", T.LongType()),
            T.StructField("first_touch", T.StringType()),
            T.StructField("last_touch", T.StringType()),
            T.StructField("dropped_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("tmax", T.LongType()),
            T.StructField("sid", T.LongType()),
            T.StructField("first_type", T.StringType()),
            T.StructField("prev_type", T.StringType()),
            T.StructField("converted", T.BooleanType()),
            T.StructField("ft", T.StringType()),
            T.StructField("lt", T.StringType()),
            T.StructField("dropped", T.LongType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        (u,) = key
        if state.exists:
            tmax, sid, first_type, prev_type, converted, ft, lt, dropped = (
                state.get
            )
        else:
            tmax, sid, first_type, prev_type, converted, ft, lt, dropped = (
                NEG, 0, None, None, False, None, None, 0,
            )

        dropped_at_entry = dropped
        out = {k: [] for k in ("sid", "ft", "lt")}

        def close_session():
            if converted:
                out["sid"].append(sid)
                out["ft"].append(ft)
                out["lt"].append(lt)

        frames = [pdf[["__tu", "__eid", type_col]] for pdf in pdfs if len(pdf)]
        if frames:
            allr = pd.concat(frames).sort_values(
                ["__tu", "__eid"], kind="stable"
            )
            for t, _eid, typ in allr.itertuples(index=False, name=None):
                t = int(t)
                if t < tmax:
                    dropped += 1  # below the high-water mark: unreplayable
                    continue
                if first_type is None or t - tmax > gap:
                    close_session()
                    sid += 1
                    first_type, converted, ft, lt = typ, False, None, None
                    if typ == conversion:
                        converted, ft, lt = True, DIRECT_CHANNEL, DIRECT_CHANNEL
                elif not converted and typ == conversion:
                    converted, ft, lt = True, first_type, prev_type
                prev_type = typ
                tmax = t

        state.update(
            (tmax, sid, first_type, prev_type, converted, ft, lt, dropped)
        )
        n = len(out["sid"])
        if n == 0 and dropped > dropped_at_entry:
            # Status row: this batch dropped events but closed no
            # converting session, so without it the violation would be
            # invisible until (unless) the user converts again.
            yield pd.DataFrame(
                {
                    user_col: [u],
                    "session_id": pd.array([None], dtype="Int64"),
                    "first_touch": pd.array([None], dtype=object),
                    "last_touch": pd.array([None], dtype=object),
                    "dropped_events": [dropped],
                }
            )
            return
        yield pd.DataFrame(
            {
                user_col: [u] * n,
                "session_id": out["sid"],
                "first_touch": out["ft"],
                "last_touch": out["lt"],
                "dropped_events": [dropped] * n,
            }
        )

    return prepared.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_binned_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs=(0.5, 0.9, 0.99),
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 200,
) -> DataFrame:
    """Streaming form of ``functions.sketches.binned_histogram`` +
    ``binned_quantiles``: per-group fixed-width bin counts maintained
    incrementally across micro-batches (state = ``n_bins`` longs per
    group — O(bins), never O(events)), emitting the CURRENT quantile
    estimates ``(<group_col>, q, est, n_seen, dropped_events)`` every
    batch the group appears in (update mode).

    Exact stream≡batch parity BY CONSTRUCTION: bin counts are a
    commutative monoid, so after the last batch the estimates equal the
    batch ``binned_quantiles(binned_histogram(all data))`` REGARDLESS
    of how the stream was split or ordered — unlike the funnel/touch
    operators there is no in-order contract. The estimate replays the
    batch formula bit-exactly: upper edge of the first bin whose
    cumulative count reaches ``q * total``, rounded HALF_UP at 9
    decimals (Spark ``F.round`` semantics, replayed via ``decimal`` on
    the shortest-roundtrip repr — the same BigDecimal.valueOf path
    Spark takes).

    Value contract, bit-matched to the batch pair (ADVICE r12):

    - NULL values are excluded from the sketch, exactly like
      ``binned_histogram``'s ``isNotNull`` filter. Exclusions are NOT
      silent: the cumulative per-group count is surfaced in the
      ``dropped_events`` output column — the shared drops-visible
      convention across all three stateful ops here (funnel/touch track
      the in-order contract, this tracks the NULL-exclusion contract; a
      consumer asserting ``dropped_events == 0`` asserts a clean feed
      in every case). NULL vs NaN is distinguished SPARK-side (an
      ``__isnull__`` flag projected before the groupBy) because Arrow
      transport collapses both to ``NaN`` in pandas.
    - A true double ``NaN`` is NOT dropped: it counts into bin 0,
      because that is what the batch path computes (``floor(NaN /
      width)`` -> long ``0`` -> clamp, verified under BOTH ANSI modes;
      Spark's ``floor`` carries no ANSI cast guard). Before this fix
      the stream silently discarded NaN while batch binned it, so the
      claimed parity broke exactly on NaN inputs.

    The output group column carries ``group_col``'s name and the input
    schema's type (the ADVICE r11 streaming_funnel_levels rule).
    Raises ``ValueError`` if the input already carries the reserved
    ``__isnull__`` column.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("every q must be in (0, 1]")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    if "__isnull__" in df.columns:
        raise ValueError(
            "streaming_binned_quantiles: input already carries the "
            "reserved __isnull__ column; rename it"
        )
    width = (hi - lo) / n_bins
    q_list = [float(q) for q in qs]

    # NULL-vs-NaN is decided here, JVM-side, before Arrow transport
    # collapses both to NaN in pandas (see docstring).
    prepared = df.withColumn("__isnull__", F.col(value_col).isNull())

    out_schema = T.StructType(
        [
            T.StructField(group_col, df.schema[group_col].dataType),
            T.StructField("q", T.DoubleType()),
            T.StructField("est", T.DoubleType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("dropped_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("dropped", T.LongType()),
        ]
    )

    def update(key, pdfs, state):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        (g,) = key
        if state.exists:
            counts = np.asarray(state.get[0], dtype=np.int64)
            dropped = int(state.get[1])
        else:
            counts = np.zeros(n_bins, dtype=np.int64)
            dropped = 0
        for pdf in pdfs:
            isnull = pdf["__isnull__"].to_numpy(dtype=bool)
            dropped += int(isnull.sum())
            v = pdf[value_col].to_numpy(dtype=float)[~isnull]
            if len(v):
                # batch parity: floor(NaN/width) -> long 0 -> clamp, so
                # a true NaN counts into bin 0 (never dropped)
                b = np.floor((v - lo) / width)
                b = np.where(np.isnan(b), 0.0, b)
                b = np.clip(b, 0, n_bins - 1).astype(np.int64)
                counts += np.bincount(b, minlength=n_bins)
        state.update((counts.tolist(), dropped))
        tot = int(counts.sum())
        if tot == 0:
            if dropped:
                # a batch of only NULLs must still surface the drops
                # (q/est null — no estimate exists yet)
                yield pd.DataFrame(
                    {
                        group_col: [g],
                        "q": [None],
                        "est": [None],
                        "n_seen": [0],
                        "dropped_events": [dropped],
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        group_col: [],
                        "q": [],
                        "est": [],
                        "n_seen": [],
                        "dropped_events": [],
                    }
                )
            return
        cum = np.cumsum(counts)
        ests = []
        for q in q_list:
            # first bin with cum >= q * tot — the batch filter replayed
            idx = int(np.argmax(cum >= q * tot))
            raw = (idx + 1) * width + lo
            # Spark F.round = BigDecimal.valueOf(double).setScale(9,
            # HALF_UP); Decimal(repr(x)) is the same shortest-roundtrip
            # decimalization
            ests.append(
                float(
                    Decimal(repr(raw)).quantize(
                        Decimal("1e-9"), rounding=ROUND_HALF_UP
                    )
                )
            )
        yield pd.DataFrame(
            {
                group_col: [g] * len(q_list),
                "q": q_list,
                "est": ests,
                "n_seen": [tot] * len(q_list),
                "dropped_events": [dropped] * len(q_list),
            }
        )

    return prepared.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
