"""Hybrid retrieval: multi-query lexical BM25 top-k and reciprocal-rank
fusion — the standard two-tower production search shape (lexical recall
+ semantic recall, fused by rank). BEYOND-REFERENCE: the reference
(MEDS_polars_functions) has no retrieval surface; the scorers follow
public formulations — Okapi BM25 per Robertson & Zaragoza 2009 (the
Lucene idf form, matching ``text.bm25_scores``), RRF per Cormack,
Clarke & Buettcher, SIGIR 2009 (score = Σ 1/(k + rank)).

Scale shape (100 TB corpus, human-scale query set):

- ``bm25_topk``: the query table is tiny and BROADCAST twice (term
  semi-join, per-query scoring join); the corpus explode is map-side
  and the broadcast LEFT SEMI join prunes it to matching tokens BEFORE
  the only corpus-sized shuffle (the (doc, term) tf aggregation). The
  df/N/avg_dl statistics are small aggregates broadcast back. Nothing
  corpus-sized is ever collected or broadcast.
- ``rrf_fuse``: inputs are already per-query top-k (≤ |Q|·k rows each)
  — the union + groupBy is a bounded shuffle keyed (query, doc); the
  corpus is never touched.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _WORDS


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    tie_round: int | None = 6,
) -> DataFrame:
    """Okapi BM25 top-k per query, for a DataFrame of term-bag queries.

    ``queries`` is (query_id, terms: array<string>) — human-scale, so
    both derived query tables are broadcast. Duplicate terms within one
    query's bag are DISTINCT-ed (a term contributes once, exactly like
    ``text.bm25_scores``' list-literal term set). Scoring matches
    ``bm25_scores`` term-for-term: Lucene idf ln(1 + (N-df+.5)/(df+.5)),
    tf saturation with k1/b length normalization over the corpus-wide
    avg length. The per-(query, doc) score is the sum over matched
    terms, rounded to ``tie_round`` before the rank window so near-tie
    ordering is reproducible across engines (the embedding_topk
    convention); ties break on ascending doc id.

    Output: (query_id, <id_col>, bm25, rank <= k); only documents
    containing at least one of the query's terms appear.
    """
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(terms_col).alias("t"),
        )
        .distinct()
    )
    term_set = qterms.select("t").distinct()

    words = docs.select(
        F.col(id_col).alias("id"), _WORDS(F.col(text_col)).alias("ws")
    )
    lens = words.select("id", F.size("ws").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avg_dl")
    )  # one row

    tf = (
        words.select("id", F.explode("ws").alias("t"))
        .join(F.broadcast(term_set), "t", "left_semi")
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "t")
        # lens is corpus-sized — never broadcast it; the join keys on the
        # (pruned) matching side and AQE picks the physical strategy
        .join(lens, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            "t",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avg_dl"))
                )
            ).alias("s"),
        )
    )
    per_query = (
        scored.join(F.broadcast(qterms), "t")
        .groupBy("query_id", "id")
        .agg(F.sum("s").alias("bm25"))
    )
    if tie_round is not None:
        per_query = per_query.select(
            "query_id", "id", F.round("bm25", tie_round).alias("bm25")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("id"))
    return (
        per_query.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias(id_col), "bm25", "rank")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    tie_round: int | None = 9,
) -> DataFrame:
    """Reciprocal-rank fusion of N per-query ranked lists (Cormack et
    al. 2009): score(q, d) = Σ_lists 1/(rrf_k + rank_list(q, d)), a
    document absent from a list simply contributes nothing (the union
    realizes the full-outer semantics without a join). Re-ranked by
    (score desc, doc id asc), cut at ``k``.

    Determinism: each contribution 1/(rrf_k + rank) is one exact double
    division, identical on any engine; with TWO lists the sum is a
    single commutative addition, so the fused score is bit-reproducible
    — with three or more lists the aggregation order varies, which
    ``tie_round`` absorbs (contributions differ at the 1e-2 scale, far
    above the default 1e-9 grid).

    Output: (query_id, <id_col>, rrf, rank <= k).
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    parts = [
        df.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("__id__"),
            (
                F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))
            ).alias("__c__"),
        )
        for df in ranked
    ]
    u = reduce(DataFrame.unionByName, parts)
    fused = u.groupBy("query_id", "__id__").agg(F.sum("__c__").alias("rrf"))
    if tie_round is not None:
        fused = fused.select(
            "query_id", "__id__", F.round("rrf", tie_round).alias("rrf")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("__id__"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("__id__").alias(id_col), "rrf", "rank")
    )
