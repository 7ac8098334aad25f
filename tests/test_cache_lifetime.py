"""Cache-lifetime guard (round 16, VERDICT r15 item 6 / ADVICE r15 item 1).

Round 15 introduced ``persist()`` calls on shingle/signature/posting/
feature intermediates that were never unpersisted: every operator call
pinned a CacheManager entry for the session lifetime (the bench harness
masked it with clearCache). Round 16 converts them to lazy
``localCheckpoint`` — the stored blocks are owned by the RDD object and
released by the ContextCleaner when it is garbage collected, not by an
explicit unpersist the caller can forget — so the CacheManager must stay
EMPTY across repeated operator calls. This test pins that contract for
every operator family the round-15 audit flagged.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    repeated_substring_spans,
    simhash_near_dup_pairs,
)
from meds_polars_functions_spark.operators.text import dsir_weights


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"the quick brown fox {i % 7} jumps over the lazy dog {i % 3} again and again")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flagged_operators_register_no_cache_entries(spark, docs):
    """DataFrame.persist() registers its CacheManager entry at CALL time
    (before any job runs), so the leak is detectable at construction —
    no execution needed for five of the six flagged operators."""
    # precondition: nothing cached from other tests in this session —
    # if this trips, the leak is in an earlier test's operator, which is
    # exactly what this guard exists to surface
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)

    target = docs.filter(F.col("doc_id") % 2 == 0)
    for _ in range(2):  # repeated calls are the leak's trigger condition
        ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5)
        ngram_jaccard_pairs_prefix(docs, "text", "doc_id", shingle_n=3, threshold=0.5)
        containment_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5)
        repeated_substring_spans(docs, "text", "doc_id", window_words=4)
        simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=3)
        dsir_weights(docs, target, "text", "doc_id", n_buckets=64)
    assert _cache_manager_empty(spark), (
        "an operator registered a CacheManager entry at construction — "
        "a long-lived session accumulates these per call (ADVICE r13 "
        "item 5 / r15 item 1 class); use a lazy localCheckpoint or "
        "unpersist at a materialization boundary"
    )


def test_executed_operator_leaves_no_cache_entries(spark, docs):
    """One executed representative: catches execution-time registration
    patterns (cacheTable, persist inside an action callback) that the
    construction-only scan above cannot see."""
    spark.catalog.clearCache()
    for _ in range(2):
        ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5).collect()
    assert _cache_manager_empty(spark)


def test_label_propagation_leaves_no_cache_entries(spark):
    """Round-16 follow-up: label_propagation returned a lazy frame over
    its persisted edge/label tables, pinning two CacheManager entries per
    call forever. The persists are dropped (ReusedExchange already
    deduplicates those subtrees within the one composed job); labels are
    unchanged."""
    from meds_polars_functions_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)] + [(20, 21), (21, 22)],
        "src long, dst long",
    )
    spark.catalog.clearCache()
    for _ in range(2):
        out = label_propagation(edges, n_iter=3)
        assert out.count() == 13
    assert _cache_manager_empty(spark)
