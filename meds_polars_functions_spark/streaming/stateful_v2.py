"""Custom stateful streaming operators on Spark 4's ``transformWithState``
API (``transformWithStateInPandas`` + ``StatefulProcessor``).

Why a second module next to ``stateful.py`` (applyInPandasWithState):
the v2 API is the scale path. State lives in named, typed state
variables (ValueState/ListState/MapState) backed by the RocksDB state
store with per-entry access — a MapState seen-set reads/writes ONE
digest entry per probe, where the v1 API round-trips the whole per-key
state blob through Arrow every micro-batch. It also adds timers and
per-state TTL, which v1 cannot express. Both modules implement the same
operator semantics so either backend can serve the pipeline; the tests
assert they agree batch-for-batch.

Semantics parity is with the reference engine's batch operators
(mergeable count/sum/max stats — aggregate_code_metadata.py:33-41
convention); the reference itself has no streaming (SURVEY §2.10).

RUNTIME REQUIREMENT: transformWithState's Python<->state-server protocol
needs ``google.protobuf`` (shipped with real Spark clusters; absent in
minimal containers). Call ``tws_available()`` to pick a backend at
runtime — ``stateful.py``'s applyInPandasWithState implementations are
the protobuf-free fallback with identical semantics.
"""

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def tws_available() -> bool:
    """True when the transformWithState runtime deps are importable."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _digest64(value) -> int:
    """Process-stable 64-bit content digest (signed, fits LongType).

    blake2b, not Python hash() (salted per process) and not crc32
    (32-bit birthday collisions ~77k values/key would silently drop
    fresh events)."""
    import hashlib

    h = hashlib.blake2b(str(value).encode(), digest_size=8).digest()
    return int.from_bytes(h, "big", signed=True)


def tws_running_stats(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key lifetime running stats via a single ValueState.

    Same output contract as ``stateful.streaming_running_stats``: one row
    per (key, micro-batch) with batch count plus lifetime count/sum/max.
    State is three scalars per key forever — O(keys), never O(events).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("batch_events", T.LongType()),
            T.StructField("total_events", T.LongType()),
            T.StructField("total_sum", T.DoubleType()),
            T.StructField("running_max", T.DoubleType()),
        ]
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "count long, sum double, max double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (k,) = key
            batch_n, batch_sum, batch_max = 0, 0.0, float("-inf")
            for pdf in rows:
                vals = pdf[value_col].dropna()
                batch_n += len(pdf)
                batch_sum += float(vals.sum())
                if len(vals):
                    batch_max = max(batch_max, float(vals.max()))
            count, total, mx = (
                self._stats.get() if self._stats.exists() else (0, 0.0, float("-inf"))
            )
            count += batch_n
            total += batch_sum
            mx = max(mx, batch_max)
            self._stats.update((count, total, mx))
            yield pd.DataFrame(
                {
                    "key": [k],
                    "batch_events": [batch_n],
                    "total_events": [count],
                    "total_sum": [total],
                    "running_max": [None if mx == float("-inf") else mx],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        RunningStats(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def tws_first_seen_dedup(
    events: DataFrame,
    key_col: str = "user_id",
    content_col: str = "event_type",
) -> DataFrame:
    """Streaming lifetime dedup: emit (key, content) only on first sight.

    The seen-set is a MapState keyed by 64-bit content digest. Unlike the
    v1 ListState-of-everything (stateful.streaming_first_seen_dedup),
    membership probes touch single state-store entries, so per-batch work
    is O(batch), not O(|seen|) serialization — the difference between
    working and not working once hot keys accumulate millions of distinct
    contents.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("content", T.StringType()),
        ]
    )

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getMapState("seen", "digest long", "one byte")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (k,) = key
            fresh: list = []
            emitted = set()  # dedup within the batch without state probes
            for pdf in rows:
                for c in pdf[content_col]:
                    d = _digest64(c)
                    if d in emitted:
                        continue
                    if not self._seen.containsKey((d,)):
                        self._seen.updateValue((d,), (1,))
                        emitted.add(d)
                        fresh.append(c)
            if fresh:
                yield pd.DataFrame({"key": [k] * len(fresh), "content": fresh})

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        FirstSeen(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
