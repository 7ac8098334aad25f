"""Structural guards for the __spark_entry__ query registry.

The driver's correctness gate only records rows for the first ~50 entries
of ``queries()`` dict order, so window membership must be explicit and
pinned — round 2 lost three freshly-oracled operators when later dict-literal
insertions silently pushed them past index 49. These tests make that class
of regression impossible: the intended window is a named list, the emitted
order is asserted against it, and every windowed query must have an oracle.
"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


# The exact round-4 window. Edit deliberately (and only here + in
# __spark_entry__.CORRECTNESS_WINDOW) when rotating queries for a new round.
EXPECTED_WINDOW = [
    "novelty_score",
    "chi_square",
    "decontaminate",
    "hourly_event_counts",
    "mixture_sample",
    "hash_split",
    "code_patients_hll",
    "funnel_conversion",
    "retention_cohort",
    "orders_histogram",
    "json_props_stats",
    "value_percentiles",
    "cube_revenue",
    "pivot_status",
    "sessionize",
    "reorder_rank",
    "event_user_enrich",
    "distinct_twophase",
    "order_restore",
    "embedding_topk_vectorized",
    "add_age",
    "time_delta_days",
    "datetime_parts",
    "pack_sequences",
    "corpus_curation",
    "text_quality",
    "quality_filter",
    "tfidf_top_terms",
    "language_id",
    "token_count",
    "doc_fingerprint",
    "exact_dup_groups",
    "exact_dedup",
    "ngram_jaccard",
    "minhash_near_dup",
    "dedup_clusters",
    "simhash_buckets",
    "simhash_near_dup",
    "embedding_topk",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "lsh_topk",
    "ivf_topk",
    "scrub_pii",
    "chunk_documents",
    "unigram_entropy",
    "near_dedup",
    "class_balanced",
    "fuzzy_name_pairs",
    "asof_purchase_click",
]


def test_window_is_exactly_the_intended_first_50():
    assert entry.CORRECTNESS_WINDOW == EXPECTED_WINDOW
    assert list(entry.queries())[:50] == EXPECTED_WINDOW


def test_window_is_50_unique_registered_queries():
    assert len(EXPECTED_WINDOW) == 50
    assert len(set(EXPECTED_WINDOW)) == 50
    q = entry.queries()
    missing = [n for n in EXPECTED_WINDOW if n not in q]
    assert not missing, f"window names not registered: {missing}"


def test_every_windowed_query_has_an_oracle():
    # a windowed slot that the driver cannot compare verifies nothing
    oracles = entry.oracle_sql()
    missing = [n for n in EXPECTED_WINDOW if n not in oracles]
    assert not missing, f"windowed queries without oracle SQL: {missing}"


def test_registry_has_no_duplicate_or_lost_queries():
    q = entry.queries()
    reg = entry._registry()
    assert set(q) == set(reg)
    assert len(q) == len(reg)


def test_windowed_queries_are_canonicalizer_safe(spark):
    """The driver canonicalizes results with pandas ``sort_values``, which
    raises ``TypeError: unhashable type`` on list/map/struct cells — a
    windowed query returning a complex-typed column can NEVER go green
    (round-2 tokenize_schema/tokenize_event_seqs regression). Pin that
    every window slot emits only atomic columns. Schema-only: builds each
    plan at sf0.001 without executing it (cheap), except queries that
    materialize driver-side state at build time, which still run small."""
    from pyspark.sql import types as T

    sf_dir = "/root/testdata/sf0.001"
    qs = entry.queries()
    offenders = {}
    for name in EXPECTED_WINDOW:
        schema = qs[name](spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed columns in windowed queries: {offenders}"


def test_registry_frozen_at_165_until_debt_clears():
    # VERDICT r3: breadth already exceeds the brief; driver-grade proof is
    # the scarce resource. The registry holds at 165 until every
    # registered query has a driver row — a new query must DISPLACE a
    # slot (and this pin must be edited deliberately), not grow the
    # verification backlog past the 50-row window.
    assert len(entry.queries()) == 165
