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
import pytest


# The exact round-14 window (ledger: COVERAGE.md). Edit deliberately (and only here + in
# __spark_entry__.CORRECTNESS_WINDOW) when rotating queries for a new round.
EXPECTED_WINDOW = [
    "audience_overlap",
    "hll_user_overlap",
    "stratified_sample",
    "weighted_group_sample",
    "kcore_trade",
    "stress_centrality",
    "streaming_hll_overlap",
    "streaming_percentile_profile",
    "pagerank_trade",
    "profile_events",
    "embedding_topk_vectorized",
    "ivf_topk",
    "heavy_hitters",
    "image_features",
    "audio_features",
    "late_order_priority",
    "returned_item_revenue",
    "top_supplier",
    "small_qty_revenue",
    "large_volume_customers",
    "brand_predicate_revenue",
    "dormant_customers",
    "moving_avg_revenue",
    "ntile_acctbal",
    "unpivot_nation_metrics",
    "only_late_supplier",
    "user_streaks",
    "bitmap_distinct_users",
    "argmax_customer",
    "group_median",
    "grouping_sets_revenue",
    "interpolate_values",
    "scd2_priority",
    "snapshot_diff",
    "window_funnel",
    "monthly_retention",
    "repeat_buyers_setop",
    "dedup_clusters_star",
    "lm_score",
    "semantic_dedup",
    "bigram_lm",
    "dsir_weights",
    "bpe_pair_counts",
    "bm25_search",
    "clf_score",
    "shuffle_positions",
    "winnow_pairs",
    "cdc_chunks",
    "logreg_step",
    "blocklist",
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


@pytest.mark.slow
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


def test_registry_pinned_at_176():
    # Round 6: the freeze condition (verification debt < window size) was
    # met by the round-6 rotation, so the registry grew 165 -> 167 with
    # the formerly-staged kneser_ney_lm + kmeans_cells (COVERAGE.md
    # round-6 ledger). Round 9: the round-8 staged pq_topk_rerank
    # registered with window slot 1, 167 -> 168. Round 10: the round-9
    # staged hybrid_search registered with window slot 1 (COVERAGE.md
    # round-10 ledger), 168 -> 169; then mmr_topk registered by explicit
    # mid-round ledger amendment (COVERAGE.md round-10 amendment),
    # 169 -> 170. Round 11: the round-10 (session 2) staged behavioral
    # pair window_funnel + monthly_retention registered with window
    # slots 1-2 (COVERAGE.md round-11 ledger), 170 -> 172. Round 12: the
    # round-11 staged sessionized-analytics pair touch_attribution +
    # session_paths registered with window slots 1-2 (COVERAGE.md
    # round-12 ledger), 172 -> 174. Round 13: the round-12 staged pair
    # approx_percentile_profile + bitemporal_asof registered with
    # window slots 1-2 (COVERAGE.md round-13 ledger), 174 -> 176.
    # Round 14: the ENTIRE round-13 staged queue (audience_overlap,
    # hll_user_overlap, stratified_sample, weighted_group_sample,
    # kcore_trade, stress_centrality) registered with window slots 1-6
    # (COVERAGE.md round-14 ledger), 176 -> 182, plus the two streaming
    # twins streaming_hll_overlap + streaming_percentile_profile built
    # and registered per the ledger's conditional clause (slots 7-8),
    # 182 -> 184. Any
    # further growth must edit this pin deliberately and land with a
    # window slot (or a fresh ledger entry), never by silently
    # extending the backlog past the 50-row window.
    assert len(entry.queries()) == 184


def test_ledger_check_function_level_granularity():
    """scripts/ledger_check.py resolves change impact at the NAME level:
    the round-7 diff (new auto-dispatch functions in dedup.py + the
    training-collect rewrites in similarity.py) must dirty exactly the
    rewritten trainers and the new names — not every importer of the
    modules — and every affected registered query must sit in the
    round-7 window (the check's PASS on the real repo history is itself
    the regression test for the r6 collect-guard miss class)."""
    import subprocess
    import sys as _sys

    # BOTH ends pinned to round-7 revs (ledger commit -> last round-7
    # operator change) so future rounds' diffs cannot flip this test;
    # each round runs the live check against its own ledger rev. The
    # check resolves CORRECTNESS_WINDOW from the head REV's source (not
    # the worktree module), so window rotation cannot flip it either.
    r = subprocess.run(
        [_sys.executable, "scripts/ledger_check.py", "d8509c0", "1c8dad1"],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ledger check PASS" in r.stdout
    # the rewritten trainers are dirty...
    assert "train_ivf_centroids" in r.stdout
    # ...but untouched operators of the same modules are not flagged
    assert "exact_dedup" not in r.stdout
    assert "brute_force_topk" not in r.stdout
