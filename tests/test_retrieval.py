"""Unit tests for operators/retrieval.py (hybrid retrieval: multi-query
BM25 top-k + reciprocal-rank fusion). The staged hybrid_search query's
oracle-grade proof lives in tests/test_staged_queries.py; these pin the
operators' internal consistency and edge semantics."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.retrieval import bm25_topk, rrf_fuse
from meds_polars_functions_spark.operators.text import bm25_scores

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog outpaces a quick fox"),
    (2, "lorem ipsum dolor sit amet consectetur"),
    (3, "the dog sat on the mat with the fox"),
    (4, "brown bears eat honey not foxes"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_topk_matches_bm25_scores_single_query(spark, docs):
    """For one query, bm25_topk's scores must equal bm25_scores' (the
    list-literal single-query scorer) on the same term bag — same idf
    form, same tf saturation, same length normalization. bm25_topk adds
    only the per-query ranking."""
    terms = ["quick", "fox", "dog"]
    expected = {
        r["doc_id"]: round(r["bm25"], 6)
        for r in bm25_scores(docs, terms, "text", "doc_id").collect()
    }
    q = spark.createDataFrame([(7, terms)], "query_id long, terms array<string>")
    got = bm25_topk(docs, q, k=10, tie_round=6).collect()
    assert {r["doc_id"]: r["bm25"] for r in got} == expected
    # ranks are dense 1..n by (score desc, doc_id asc)
    ranks = sorted(r["rank"] for r in got)
    assert ranks == list(range(1, len(got) + 1))
    by_rank = sorted(got, key=lambda r: r["rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a["bm25"], -a["doc_id"]) >= (b["bm25"], -b["doc_id"])
        if a["bm25"] == b["bm25"]:
            assert a["doc_id"] < b["doc_id"]


def test_bm25_topk_duplicate_terms_count_once(spark, docs):
    """A duplicated term in a query's bag must not double its score —
    bm25_topk DISTINCTs the (query, term) pairs, matching bm25_scores'
    set-of-terms semantics."""
    q1 = spark.createDataFrame([(0, ["fox", "dog"])], "query_id long, terms array<string>")
    q2 = spark.createDataFrame(
        [(0, ["fox", "fox", "dog"])], "query_id long, terms array<string>"
    )
    a = {(r["doc_id"], r["bm25"]) for r in bm25_topk(docs, q1).collect()}
    b = {(r["doc_id"], r["bm25"]) for r in bm25_topk(docs, q2).collect()}
    assert a == b


def test_bm25_topk_multi_query_isolation(spark, docs):
    """Each query is scored against its own bag only: a multi-query run
    must emit exactly the union of the single-query runs."""
    bags = {1: ["quick", "brown"], 2: ["lorem", "dolor"]}
    multi = spark.createDataFrame(
        [(qid, ts) for qid, ts in bags.items()], "query_id long, terms array<string>"
    )
    got = {
        (r["query_id"], r["doc_id"], r["bm25"], r["rank"])
        for r in bm25_topk(docs, multi).collect()
    }
    want = set()
    for qid, ts in bags.items():
        single = spark.createDataFrame([(qid, ts)], "query_id long, terms array<string>")
        want |= {
            (r["query_id"], r["doc_id"], r["bm25"], r["rank"])
            for r in bm25_topk(docs, single).collect()
        }
    assert got == want


def test_rrf_fuse_two_lists_hand_computed(spark):
    """RRF on two tiny lists, checked against hand arithmetic:
    score = 1/(60+rank_lex) + 1/(60+rank_sem), absent list contributes
    nothing, ties break on ascending doc id."""
    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id long, doc_id long, rank int"
    )
    out = {r["doc_id"]: (r["rrf"], r["rank"]) for r in rrf_fuse([lex, sem], k=10).collect()}
    exp_score = {
        11: round(1 / 62 + 1 / 61, 9),  # in both lists
        10: round(1 / 61, 9),
        13: round(1 / 62, 9),
        12: round(1 / 63, 9),
    }
    assert {d: s for d, (s, _) in out.items()} == exp_score
    # 11 (two contributions) first, then 10 (1/61), 13 (1/62), 12 (1/63)
    assert [d for d, (_, r) in sorted(out.items(), key=lambda kv: kv[1][1])] == [
        11, 10, 13, 12,
    ]


def test_rrf_fuse_k_cut_and_empty_input(spark):
    lex = spark.createDataFrame(
        [(0, i, i + 1) for i in range(5)], "query_id long, doc_id long, rank int"
    )
    assert rrf_fuse([lex], k=2).count() == 2
    with pytest.raises(ValueError):
        rrf_fuse([])


# ---------------------------------------------------------------------------
# mmr_rerank (round-10 staged operator)
# ---------------------------------------------------------------------------

from meds_polars_functions_spark.operators.retrieval import mmr_rerank  # noqa: E402


@pytest.fixture(scope="module")
def mmr_inputs(spark):
    # doc 10 most relevant, doc 11 a near-duplicate of 10, doc 12
    # orthogonal — the canonical diversity-vs-relevance setup.
    cand = spark.createDataFrame(
        [(0, 10, 0.95), (0, 11, 0.90), (0, 12, 0.50)],
        "query_id long, doc_id long, score double",
    )
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.999, 0.0447]), (12, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    return cand, emb


def test_mmr_hand_computed_diversity(spark, mmr_inputs):
    """lam=0.7: pick1 = 10 (relevance argmax, mmr 0.7*0.95 = 0.665);
    pick2 = 12 (0.35 beats 11's 0.63 - 0.3*sim(11,10) ~= 0.3303 — the
    near-duplicate is penalized past the weaker-but-diverse doc);
    pick3 = 11. Pure relevance order would be 10, 11, 12."""
    cand, emb = mmr_inputs
    got = [
        (r["doc_id"], r["mmr"], r["rank"])
        for r in mmr_rerank(cand, emb, k=3, lam=0.7).orderBy("rank").collect()
    ]
    assert [d for d, _, _ in got] == [10, 12, 11]
    assert got[0][1] == round(0.7 * 0.95, 9)
    assert got[1][1] == round(0.7 * 0.50, 9)
    # sim(11,10) = 0.999/sqrt(0.999^2 + 0.0447^2) rounded to 9
    import math

    s = round(0.999 / math.sqrt(0.999**2 + 0.0447**2), 9)
    assert got[2][1] == round(0.7 * 0.90 - (1.0 - 0.7) * s, 9)


def test_mmr_lam_one_is_pure_relevance(spark, mmr_inputs):
    """lam=1.0 zeroes the redundancy penalty: the output must be the
    relevance order with mmr == round(rel, 9)."""
    cand, emb = mmr_inputs
    got = [
        (r["doc_id"], r["mmr"])
        for r in mmr_rerank(cand, emb, k=3, lam=1.0).orderBy("rank").collect()
    ]
    assert got == [(10, 0.95), (11, 0.90), (12, 0.50)]


def test_mmr_singleton_and_k_truncation(spark, mmr_inputs):
    """A query with one candidate yields one row (the left join keeps
    pairless spine rows); k larger than the candidate count truncates."""
    cand, emb = mmr_inputs
    single = spark.createDataFrame(
        [(7, 12, 0.4)], "query_id long, doc_id long, score double"
    )
    rows = mmr_rerank(single, emb, k=5, lam=0.7).collect()
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in rows] == [(7, 12, 1)]
    assert rows[0]["mmr"] == round(0.7 * 0.4, 9)
    assert mmr_rerank(cand, emb, k=99, lam=0.7).count() == 3


def test_mmr_drops_candidates_without_embeddings(spark, mmr_inputs):
    """A candidate with no embedding row cannot be similarity-penalized
    — the documented contract drops it (inner join) rather than scoring
    it with a silent zero penalty."""
    cand, emb = mmr_inputs
    cand2 = cand.union(
        spark.createDataFrame(
            [(0, 99, 0.99)], "query_id long, doc_id long, score double"
        )
    )
    got = [r["doc_id"] for r in mmr_rerank(cand2, emb, k=4, lam=0.7).collect()]
    assert 99 not in got and len(got) == 3
