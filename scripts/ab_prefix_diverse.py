"""Interleaved same-session A/B (SCALE.md METHOD) of the AllPairs
prefix-filter scale paths vs their posting-join baselines on a
SHINGLE-DIVERSE corpus (VERDICT r5 item 4).

The stock bench corpus has a 31-word vocabulary, which defeats prefix
filtering: every shingle is common, so the rarest-prefix rank window
pays its shuffle without shrinking the posting join. Real corpora are
Zipfian — a few heavy shingles (where the posting join goes quadratic)
and a long rare tail (which the prefix keeps). This script synthesizes
that shape deterministically IN SPARK (no driver-side data), runs
baseline vs prefix interleaved at t=0.5/0.8 for both directed
containment and symmetric Jaccard, asserts the outputs are identical
(they are theorem-equal), and prints one JSON line per measurement.

Corpus: N_DOCS docs, words drawn Zipf-ishly from a V-word vocabulary via
word_rank = floor(V^u), u = uniform01(xxhash64(doc_id, pos, SEED)) —
log-uniform ranks = rank-frequency ~ 1/r. 10% of docs are planted
near-dups: doc i >= N_BASE shares its first 80% of words with doc
i - N_BASE. Lengths vary 40..160 words.

BOILERPLATE knob (the regime where AllPairs prefix actually pays): with
N_TEMPLATES > 0, every doc is prefixed with one of N_TEMPLATES fixed
30-word boilerplate blocks (template picked by hash of the base doc id —
the web-crawl header/footer shape). Each template's ~30 shingles then
appear in ~N_DOCS/N_TEMPLATES postings, so the posting-join baseline's
pair expansion Sum(p^2) goes quadratic on them, while the rarest-first
prefix provably never joins them. Measured round-6 diagnostic: the
boilerplate-free diverse corpus has Sum(p^2) ~ 2.2x postings (89%
singleton shingles — baseline near-linear, prefix can't win); the bench
corpus 4.9x; boilerplate pushes it to 30x+ where the crossover lives.

Usage: python scripts/ab_prefix_diverse.py [N_DOCS] [VOCAB] [ROUNDS] [N_TEMPLATES]
Defaults: 30000 docs, 200000 vocab, 3 rounds, 0 templates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.dedup import (
    containment_pairs,
    containment_pairs_prefix,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
)
from meds_polars_functions_spark.session import get_spark

SEED = 20260815
#: Bump when diverse_docs() changes shape: the /tmp scratch parquet is
#: keyed by (GEN_VERSION, SEED, n_docs, vocab, n_templates) so an edit to
#: the generator or the seed can never silently reuse a stale corpus
#: (ADVICE r7 item 3).
GEN_VERSION = 2


def diverse_docs(spark, n_docs: int, vocab: int, n_templates: int = 0,
                 tpl_words: int = 30):
    """Deterministic Zipf-ish corpus, generated map-side (one projection,
    no shuffle, no driver data). n_templates > 0 prepends a fixed
    boilerplate block shared by ~n_docs/n_templates docs."""
    n_base = int(n_docs * 0.9)
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    length = (F.lit(40) + F.pmod(F.xxhash64("doc_id", F.lit(SEED + 1)), F.lit(121))).cast("int")
    # near-dups: the first 80% of a planted dup's words come from its base doc
    base_id = F.when(
        F.col("doc_id") >= n_base, F.col("doc_id") - F.lit(n_base)
    ).otherwise(F.col("doc_id"))
    def word(doc, pos):
        u = (
            F.shiftrightunsigned(F.xxhash64(doc, pos, F.lit(SEED)), 11)
            / F.lit(float(1 << 53))
        )
        rank = F.floor(F.pow(F.lit(float(vocab)), u)).cast("long")
        return F.concat(F.lit("w"), rank.cast("string"))
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: word(
            F.when(i <= (length * 0.8).cast("int"), base_id).otherwise(F.col("doc_id")),
            i,
        ),
    )
    if n_templates:
        tpl = F.pmod(F.xxhash64(base_id, F.lit(SEED + 2)), F.lit(n_templates))
        boiler = F.transform(
            F.sequence(F.lit(1), F.lit(tpl_words)),
            lambda i: F.concat(F.lit("b"), tpl.cast("string"), F.lit("_"), i.cast("string")),
        )
        words = F.concat(boiler, words)
    return ids.select("doc_id", F.array_join(words, " ").alias("text"))


def uniform_docs(spark, n_docs: int, vocab: int, n_templates: int = 0,
                 tpl_words: int = 30):
    """NON-Zipfian control corpus (VERDICT r8 item 4): same skeleton as
    diverse_docs (lengths, planted near-dups, uniformly-popular
    boilerplate templates) but body words drawn UNIFORMLY from the vocab
    — no Zipf head. All shingle expansion therefore comes from the flat
    template blocks: the shingle document-frequency distribution is
    bimodal (f ≈ n_docs/n_templates or f = 1) instead of Zipf's graded
    tail, which is exactly the shape difference the jaccard volume
    cutover (AUTO_PREFIX_SUMP2_CUTOVER, calibrated on Zipfian cells
    only) has never been measured against. Σf² ≈ 28·n²/T + postings,
    so n_templates dials the candidate volume directly."""
    n_base = int(n_docs * 0.9)
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    length = (F.lit(40) + F.pmod(F.xxhash64("doc_id", F.lit(SEED + 1)), F.lit(121))).cast("int")
    base_id = F.when(
        F.col("doc_id") >= n_base, F.col("doc_id") - F.lit(n_base)
    ).otherwise(F.col("doc_id"))
    def word(doc, pos):
        # uniform rank in [0, vocab): pmod of the hash, not vocab^u
        rank = F.pmod(F.xxhash64(doc, pos, F.lit(SEED + 3)), F.lit(vocab))
        return F.concat(F.lit("u"), rank.cast("string"))
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: word(
            F.when(i <= (length * 0.8).cast("int"), base_id).otherwise(F.col("doc_id")),
            i,
        ),
    )
    if n_templates:
        tpl = F.pmod(F.xxhash64(base_id, F.lit(SEED + 2)), F.lit(n_templates))
        boiler = F.transform(
            F.sequence(F.lit(1), F.lit(tpl_words)),
            lambda i: F.concat(F.lit("b"), tpl.cast("string"), F.lit("_"), i.cast("string")),
        )
        words = F.concat(boiler, words)
    return ids.select("doc_id", F.array_join(words, " ").alias("text"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_templates = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    spark = get_spark("ab_prefix_diverse")
    scratch = (
        f"/tmp/spark_graft_diverse_v{GEN_VERSION}_s{SEED}"
        f"_{n_docs}_{vocab}_{n_templates}"
    )
    if not os.path.exists(scratch):
        diverse_docs(spark, n_docs, vocab, n_templates).write.mode("overwrite").parquet(scratch)
    docs = spark.read.parquet(scratch)

    VARIANTS = {
        ("containment", "baseline"): containment_pairs,
        ("containment", "prefix"): containment_pairs_prefix,
        ("jaccard", "baseline"): ngram_jaccard_pairs,
        ("jaccard", "prefix"): ngram_jaccard_pairs_prefix,
    }

    def run(family: str, variant: str, t: float) -> float:
        fn = VARIANTS[(family, variant)]
        t0 = time.time()
        fn(docs, "text", "doc_id", threshold=t).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    # identity check once per (family, t): theorem-equal outputs
    for family in ("containment", "jaccard"):
        for t in (0.5, 0.8):
            a = VARIANTS[(family, "baseline")](docs, "text", "doc_id", threshold=t).count()
            b = VARIANTS[(family, "prefix")](docs, "text", "doc_id", threshold=t).count()
            print(json.dumps({"family": family, "t": t, "pairs_baseline": a,
                              "pairs_prefix": b, "identical": a == b}), flush=True)
            assert a == b, (family, t, a, b)

    results: dict[tuple, list[float]] = {}
    samples: list[dict] = []
    # warm both paths, then interleave
    for family in ("containment", "jaccard"):
        for t in (0.5, 0.8):
            for variant in ("baseline", "prefix"):
                run(family, variant, t)
    for r in range(rounds):
        for family in ("containment", "jaccard"):
            for t in (0.5, 0.8):
                for variant in ("baseline", "prefix"):
                    sec = run(family, variant, t)
                    results.setdefault((family, t, variant), []).append(sec)
                    samples.append({"round": r, "family": family, "t": t,
                                    "variant": variant, "sec": sec})
                    print(json.dumps(samples[-1]), flush=True)
    summary = {"n_templates": n_templates}
    for (family, t, variant), xs in results.items():
        xs = sorted(xs)
        summary[f"{family}_t{t}_{variant}_median"] = xs[len(xs) // 2]
    for family in ("containment", "jaccard"):
        for t in (0.5, 0.8):
            b = summary[f"{family}_t{t}_baseline_median"]
            p = summary[f"{family}_t{t}_prefix_median"]
            summary[f"{family}_t{t}_prefix_vs_baseline_pct"] = round(100 * (p - b) / b, 1)
    print(json.dumps({"n_docs": n_docs, "vocab": vocab, **summary}), flush=True)
    # raw samples into the repo (VERDICT r7 item 4): medians in SCALE.md
    # must stay auditable after the fact.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "records"), exist_ok=True)
    out_path = os.path.join(
        repo, "records",
        f"ab_prefix_diverse_{n_docs}d_{vocab}v_{n_templates}tpl.json",
    )
    with open(out_path, "w") as fh:
        json.dump({"n_docs": n_docs, "vocab": vocab, "rounds": rounds,
                   "samples": samples, "summary": summary}, fh, indent=1)
    print(f"raw samples -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
