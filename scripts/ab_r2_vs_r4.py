"""Controlled same-session A/B: end-of-round-2 code vs current code on
the 19 frozen headline keys, interleaved (r2, r4, r2, r4, ...) inside ONE
warm Spark session — the experiment VERDICT r3 asked for to separate
host variance from code regressions (BENCH_r03 read +17% vs BENCH_r02 on
bit-identical plans, which only host variance could explain; this
interleaving removes the host from the comparison).

Usage: git worktree add /tmp/r2tree <end-of-round-2-sha>
       python scripts/ab_r2_vs_r4.py [/tmp/r2tree] [n_rounds]
Prints one JSON line per (tree, round) with per-query seconds, then a
per-query median delta summary.
"""

import json
import os
import statistics
import sys
import time

R4_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R2_TREE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2tree"
N_ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "pricing_summary", "revenue_by_nation", "top_orders_per_customer",
    "agg_code_metadata", "normalization", "occlude_outliers",
    "filter_patients_min_events", "dedup_keep_first", "tokenize_event_seqs",
    "hourly_event_counts", "sessionize", "text_quality", "language_id",
    "doc_fingerprint", "minhash_near_dup", "embedding_topk",
    "embedding_topk_vectorized", "asof_purchase_click", "decontaminate",
]


def load_tree(tree: str):
    """Swap the engine implementation under a shared Spark session."""
    for mod in list(sys.modules):
        if mod == "__spark_entry__" or mod.startswith("meds_polars_functions_spark"):
            del sys.modules[mod]
    sys.path[:] = [p for p in sys.path if p not in (R2_TREE, R4_TREE)]
    sys.path.insert(0, tree)
    import __spark_entry__ as em  # noqa: PLC0415

    return em


def run_suite(spark, em, label: str) -> dict[str, float]:
    queries = em.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, SF_DIR).count()  # frozen BENCH methodology
        out[name] = round(time.time() - t0, 3)
    print(json.dumps({"tree": label, "total": round(sum(out.values()), 3),
                      "queries": out}), flush=True)
    return out


def main() -> None:
    sys.path.insert(0, R4_TREE)
    from meds_polars_functions_spark.session import get_spark

    spark = get_spark("ab")
    # warm exactly like bench.py: JVM, scan, Python worker pool
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    em4 = load_tree(R4_TREE)
    em4._t(spark, SF_DIR, "lineitem").count()
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    par = spark.sparkContext.defaultParallelism
    spark.range(0, 10 * par, 1, par).select(_noop("id")).count()
    # one throwaway suite per tree so codegen caches are warm for BOTH
    run_suite(spark, load_tree(R2_TREE), "warmup-r2")
    run_suite(spark, load_tree(R4_TREE), "warmup-r4")

    r2_runs, r4_runs = [], []
    for _ in range(N_ROUNDS):
        r2_runs.append(run_suite(spark, load_tree(R2_TREE), "r2"))
        r4_runs.append(run_suite(spark, load_tree(R4_TREE), "r4"))

    summary = {}
    for name in HEADLINE:
        m2 = statistics.median(r[name] for r in r2_runs)
        m4 = statistics.median(r[name] for r in r4_runs)
        summary[name] = {"r2_med": m2, "r4_med": m4,
                         "delta_pct": round(100.0 * (m4 - m2) / m2, 1)}
    t2 = round(sum(v["r2_med"] for v in summary.values()), 3)
    t4 = round(sum(v["r4_med"] for v in summary.values()), 3)
    print(json.dumps({"summary": summary, "r2_total_med": t2,
                      "r4_total_med": t4,
                      "total_delta_pct": round(100.0 * (t4 - t2) / t2, 1)}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
