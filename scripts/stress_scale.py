"""Scale-stress harness: blow /root/testdata/sf0.1 up N× (id-offset
unions, written once to a scratch dir) and measure how the headline
plans scale. Near-linear wall-clock growth = the plan is shuffle/agg
bound the way SCALE.md claims; superlinear growth flags a plan that
would not survive the 100 TB case.

Usage: python scripts/stress_scale.py [N_COPIES] [SCRATCH_DIR]
Defaults: 16 copies (~9.6M lineitem rows), /tmp/spark_graft_stress.
Prints one JSON line per dataset scale with per-query seconds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as em
from meds_polars_functions_spark.session import get_spark

#: queries spanning the main plan shapes: scan+agg, star join, window,
#: patient regroup, text map-side, minhash (UDF+bucket), packing window
STRESS_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "agg_code_metadata",
    "dedup_keep_first",
    "hourly_event_counts",
    "text_quality",
    "minhash_near_dup",
    "pack_sequences",
    # round-2 operators: decontamination (broadcast shingle semi-join),
    # Gopher repetition folds (per-row, no shuffle), repeated-span
    # window hashes (hash-tuple shuffle only)
    "decontaminate",
    "repetition_stats",
    "repeated_spans",
    # scale-path additions (round-1 late): map-side top-k prune vs the
    # direct window above it, bitmap exact distinct, gaps-and-islands,
    # grid interpolation, SCD2 build, CDC diff, deletion-neighborhood
    # fuzzy join
    "topk_pruned",
    "bitmap_distinct_users",
    "user_streaks",
    "interpolate_values",
    "scd2_priority",
    "snapshot_diff",
    # round-3 operators: star-contraction components (edge-table rounds),
    # unigram-LM scoring (vocab-bounded count + posting join),
    # SemDeDup (cell-bucketed within-cell cosine)
    "dedup_clusters_star",
    "lm_score",
    "semantic_dedup",
    # round-3 late additions: bigram backoff LM (token-pair stream +
    # vocab-bounded counts), DSIR (fixed-size bucket ratio table),
    # BPE pair counting (word-freq-table-bounded), global shuffle rank
    "bigram_lm",
    "dsir_weights",
    "bpe_pair_counts",
    "shuffle_positions",
    "fuzzy_name_pairs",
    # PQ ANN: corpus encode is map-side literal algebra, ADC scan is a
    # broadcast join — wall should track the single corpus pass
    "pq_topk",
    # winnowing: Arrow-batched map-side selection, posting self-join
    # shuffles only the ~2/(w+1) selected (hash, id) tuples
    "winnow_pairs",
    # span dedup: hash-only winner election + per-doc keep-lists; the
    # document text shuffles exactly once (the id join). histogram
    # quantiles: exchange carries the fixed-size cell table. dim stats:
    # exchange is partitions x dims, row-count independent. temperature
    # mixture: tiny count agg + broadcast rate dim, corpus stays put.
    "span_dedup",
    "binned_quantiles",
    "embedding_dim_stats",
    "temperature_mixture",
    # sufficient-statistic family: one partial-agg pass each, reduce
    # side is group/state/pair-bounded — expected scan-bound
    "code_value_trend",
    "event_transitions",
    "code_pmi",
    "welch_ttest",
    "novelty_score",
    # round 4: the end-to-end curation composition — four families in
    # one declarative plan; should scale like its worst member
    # (span_dedup's hash-posting shuffle), not like their sum
    "curation_v2",
    # round-4 widening: the families the r3 stress table missed —
    # degree-oriented wedges (O(sqrt E) fan-out cap), deterministic LPA
    # (per-iter joins against a persisted edge exchange), JL
    # reduce-then-search (map-side projection), incremental dedup
    # (history index never re-paired), directed containment postings,
    # BM25 (query-term-filtered postings), hashed classifier inference
    # (zero shuffle), BPE encode (distinct-word-bounded fold passes)
    "triangles",
    "label_propagation",
    "jl_topk",
    "incremental_dedup",
    "containment",
    "bm25_search",
    "clf_score",
    "bpe_encode",
]

# Key DOMAINS: every column in a domain (primary key + the foreign keys
# that reference it) must shift by the SAME per-copy offset, or the
# blown-up data loses referential integrity — fact-dim joins shrink
# (disjoint key ranges) or fan out (duplicated dim keys), and measured
# "scaling" is an artifact of broken data, not the plan. Offset = max
# key in the domain + 1, so copies are disjoint self-consistent
# universes. nation/region carry no offset columns and are written
# ONCE: duplicating a dimension key 16× would multiply every broadcast
# join's output 16× per copy.
DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
COPIED_TABLES = [
    "lineitem", "orders", "customer", "supplier", "part",
    "events", "documents", "embeddings",
]
SHARED_DIMS = ["nation", "region"]


def materialize(spark, src_dir: str, out_dir: str, n_copies: int) -> None:
    # per-domain offset from the primary table's max key
    offsets = {}
    for domain, cols in DOMAINS.items():
        table, col = cols[0]
        offsets[domain] = (
            em._t(spark, src_dir, table).agg(F.max(col)).collect()[0][0] + 1
        )
    col_domain = {
        (table, col): domain
        for domain, cols in DOMAINS.items()
        for table, col in cols
    }
    for table in SHARED_DIMS:
        em._t(spark, src_dir, table).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
    for table in COPIED_TABLES:
        src = em._t(spark, src_dir, table)
        copies = []
        for i in range(n_copies):
            c = src
            for col in src.columns:
                domain = col_domain.get((table, col))
                if domain is not None:
                    c = c.withColumn(col, F.col(col) + F.lit(i * offsets[domain]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def run_suite(spark, sf_dir: str, label: str) -> None:
    queries = em.queries()
    timings = {}
    for name in STRESS_QUERIES:
        t0 = time.time()
        # noop sink, not count(): count() lets Catalyst ELIMINATE
        # projections that don't change cardinality (window functions,
        # map-side transforms), silently under-measuring window-only
        # queries. The noop sink evaluates every output column JVM-side.
        # (Timings before this change used count(); aggregate-shaped
        # queries are unaffected, window/projection-shaped ones read
        # slightly higher now — the honest number.)
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {"dataset": label, "total": round(sum(timings.values()), 3), "queries": timings}
        ),
        flush=True,
    )


def ensure_scratch(spark, src_dir: str, scratch: str, n_copies: int) -> None:
    """Materialize ``src_dir`` x ``n_copies`` into ``scratch`` unless an
    identical materialization is already there. Identity = a marker file
    recording BOTH the source dir and the copy count (ADVICE r12 item 4:
    an existence-only guard silently reused stale scratch materialized
    with a different copy count — or, worse, a different source SF,
    since several stress scripts share the default scratch path — and
    mislabeled the result line)."""
    marker = os.path.join(scratch, ".materialized")
    want = f"{src_dir}|{n_copies}"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == want:
                return
    materialize(spark, src_dir, scratch, n_copies)
    with open(marker, "w") as fh:
        fh.write(want)


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_stress"
    src = "/root/testdata/sf0.1"
    spark = get_spark("stress")
    em._prep(spark)  # nanos-timestamp reads + non-ANSI semantics

    # No pre-rmtree: ensure_scratch's source+copy-count marker already
    # detects staleness and rebuilds, so a matching scratch is REUSED
    # across runs (ADVICE r13 item 3 — the rmtree made the marker dead
    # code and re-materialized every run).
    t0 = time.time()
    ensure_scratch(spark, src, scratch, n_copies)
    print(json.dumps({"materialize_sec": round(time.time() - t0, 3), "copies": n_copies}), flush=True)

    # warm (same rationale as bench.py), then measure base and blown-up
    run_suite(spark, src, "warmup@sf0.1")
    run_suite(spark, src, "sf0.1")
    run_suite(spark, scratch, f"sf0.1x{n_copies}")
    spark.stop()


if __name__ == "__main__":
    main()
