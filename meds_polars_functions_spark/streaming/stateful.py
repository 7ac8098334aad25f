"""Custom stateful streaming operators via ``applyInPandasWithState``.

These cover semantics Spark's built-in streaming aggregations cannot
express: state that must persist across micro-batches with per-group
custom transition logic. State is kept per group key in the state store
(RocksDB/HDFS-backed on a cluster), so memory is O(active keys), not
O(events).
"""

from pyspark.sql import DataFrame
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
