"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() materializes the full plan;
results are never collected to the driver)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from meds_polars_functions_spark.session import get_spark

#: Headline queries: the engine's spine (scan/agg/join/window/sort), the
#: MEDS operator chain, and the scale-path extras.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "agg_code_metadata",
    "normalization",
    "occlude_outliers",
    "filter_patients_min_events",
    "dedup_keep_first",
    "tokenize_event_seqs",
    "hourly_event_counts",
    "sessionize",
    "text_quality",
    "language_id",
    "doc_fingerprint",
    "minhash_near_dup",
    "embedding_topk",
    "embedding_topk_vectorized",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries = entry_mod.queries()

    # warm the JVM/codegen/file-index paths so the first timed query does
    # not absorb session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    entry_mod._t(spark, sf_dir, "lineitem").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
