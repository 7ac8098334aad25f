"""Registration-grade proof for the round-14 streaming-twin driver rows
(VERDICT r13 item 4): strict oracle compare at sf0.001 with the same
comparator the driver sweep uses, plus falsifiability of the two
streaming-specific invariants — ``stream_equals_batch`` flips when a
micro-batch is dropped, and the 2-eps merged-summary rank window still
BINDS (a swapped percentile answer flips ``rank_ok``).

The micro-batch parity mechanics themselves (shuffled/reversed chunk
order, batch == stream expression identity) are pinned in
tests/test_streaming.py; these tests cover the DRIVER-ROW contract
layered on top.
"""

from __future__ import annotations

import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from tests.test_staged_queries import _strict_compare_staged

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_streaming_hll_overlap_matches_oracle_strict(spark, con):
    """Slot-7 row vs its invariant oracle: exact counts recomputed
    definitionally, all four flags (tolerance, inclusion-exclusion
    bound, stream==batch monoid identity, multi-batch split) at 1.0."""
    _strict_compare_staged(spark, con, "streaming_hll_overlap")


def test_streaming_percentile_profile_matches_oracle_strict(spark, con):
    """Slot-8 row vs its invariant oracle: n/p0/p100 recomputed
    definitionally; rank_ok at the 2-eps merged window and multi_batch
    at 1.0."""
    _strict_compare_staged(spark, con, "streaming_percentile_profile")


@pytest.mark.slow
def test_est_within_tol_binds_on_dropped_batch(spark):
    """Falsifiability of ``est_within_tol``: replay the SAME audience
    feed with ~1/5 of the users removed (a dropped/lost micro-batch's
    worth of rows) — the streamed estimates then sit ~20% below the
    full-corpus exact counts, far outside the 5% tolerance, so the
    flag the row pins at 1.0 flips for at least one group. On the
    intact feed the strict oracle test above already pins it at 1.0
    for EVERY group."""
    from meds_polars_functions_spark.streaming.events import streaming_hll_overlap

    tagged, _, _ = entry._audience_sides(spark, SF_DIR)
    fed = tagged.filter(F.col("__in_a__") | F.col("__in_b__"))
    dropped = fed.filter(F.col("user_id") % 5 != 0)
    streamed, n_batches = entry._stream_to_memory(
        spark,
        dropped,
        lambda s: streaming_hll_overlap(
            s, ["event_type"], "user_id", "__in_a__", "__in_b__"
        ),
        "tw_drop",
    )
    assert n_batches >= 2
    member = (
        tagged.groupBy("event_type", "user_id")
        .agg(
            F.max(F.col("__in_a__").cast("int")).alias("in_a"),
            F.max(F.col("__in_b__").cast("int")).alias("in_b"),
        )
        .filter((F.col("in_a") == 1) | (F.col("in_b") == 1))
    )
    exact = {
        r["event_type"]: (r["xa"], r["xb"], r["xu"])
        for r in member.groupBy("event_type")
        .agg(
            F.sum("in_a").alias("xa"),
            F.sum("in_b").alias("xb"),
            F.count(F.lit(1)).alias("xu"),
        )
        .collect()
    }
    tol = entry._HLL_OVERLAP_TOL
    s_rows = {r["event_type"]: r for r in streamed.collect()}
    assert set(s_rows) == set(exact)
    flipped = [
        g
        for g, (xa, xb, xu) in exact.items()
        if (
            abs(s_rows[g]["n_a"] - xa) > tol * xa
            or abs(s_rows[g]["n_b"] - xb) > tol * xb
            or abs(s_rows[g]["n_union"] - xu) > tol * xu
        )
    ]
    assert flipped, "dropping a fifth of the users must flip the tolerance flag"


@pytest.mark.slow
def test_merged_rank_window_binds_on_swapped_answers(spark):
    """Falsifiability of the 2-eps merged-summary window: take the REAL
    streamed profile (multi-micro-batch GK merge), swap p99's answer
    into p50's row, and the ``rank_ok`` flag at accuracy//2 must flip —
    i.e. the relaxed window is still a binding check, not a tautology."""
    from meds_polars_functions_spark.operators.profiles import (
        verify_percentile_profile,
    )
    from meds_polars_functions_spark.streaming.events import (
        streaming_percentile_profile,
    )

    ev = entry._t(spark, SF_DIR, "events")
    fed = ev.filter(F.col("value").isNotNull()).select("event_type", "value")
    ps = [0.0, *entry._PROFILE_PERCENTILES, 1.0]
    streamed, n_batches = entry._stream_to_memory(
        spark,
        fed,
        lambda s: streaming_percentile_profile(
            s, "value", ["event_type"], ps, accuracy=entry._PROFILE_ACCURACY
        ),
        "tw_swap",
    )
    assert n_batches >= 2
    acc = entry._PROFILE_ACCURACY // 2
    honest = verify_percentile_profile(ev, streamed, "value", ["event_type"], acc)
    assert all(r["rank_ok"] for r in honest.collect())
    p99 = streamed.filter(F.col("percentile") == 0.99).select(
        "event_type", F.col("approx_value").alias("__v99__")
    )
    doctored = (
        streamed.join(p99, "event_type")
        .withColumn(
            "approx_value",
            F.when(F.col("percentile") == 0.5, F.col("__v99__")).otherwise(
                F.col("approx_value")
            ),
        )
        .drop("__v99__")
    )
    lied = verify_percentile_profile(ev, doctored, "value", ["event_type"], acc)
    flipped = [
        r
        for r in lied.collect()
        if r["percentile"] == 0.5 and not r["rank_ok"]
    ]
    assert flipped, "p99-as-p50 must flip rank_ok in the 2-eps window"
