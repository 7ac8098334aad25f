"""Round-3 training-data operators: distributed BPE, stupid-backoff
bigram LM, DSIR importance weights, deterministic shuffle."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.bpe import (
    apply_merge,
    bpe_encode,
    bpe_train,
    init_symbol_table,
    pair_counts,
    word_freq_table,
)
from meds_polars_functions_spark.operators.packing import (
    deterministic_shuffle,
    shuffle_positions,
)
from meds_polars_functions_spark.operators.text import bigram_lm_score, dsir_weights


# --- pure-Python reference BPE (Sennrich-style, word-freq dict) ----------


def _ref_tokenize(text: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9']+", text.lower()) if w]


def _ref_bpe_train(texts: list[str], n_merges: int):
    vocab = Counter()
    for t in texts:
        vocab.update(_ref_tokenize(t))
    symtab = {w: tuple(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in symtab.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # same tie-break as the Spark argmax: count desc, then pair asc
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((a, b))
        for w, syms in list(symtab.items()):
            out, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == a and s == b:
                    out.append(a + b)
                    pend = None
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            symtab[w] = tuple(out)
    return merges, symtab


CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "low lower lowest",
    "low low low newer newest",
    "a banana and a bandana",
]


@pytest.mark.slow
def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, symtab = bpe_train(df, "text", n_merges=8, checkpoint_every=3)
    ref_merges, ref_symtab = _ref_bpe_train(CORPUS, 8)
    assert merges == ref_merges
    got = {r["word"]: tuple(r["syms"]) for r in symtab.collect()}
    assert got == ref_symtab


def test_apply_merge_overlapping_greedy(spark):
    tab = spark.createDataFrame(
        [("aaa", 1, ["a", "a", "a"]), ("abab", 1, ["a", "b", "a", "b"])],
        "word string, freq long, syms array<string>",
    )
    out = {r["word"]: r["syms"] for r in apply_merge(tab, "a", "a").collect()}
    assert out["aaa"] == ["aa", "a"]  # leftmost-first, non-overlapping
    out2 = {r["word"]: r["syms"] for r in apply_merge(tab, "a", "b").collect()}
    assert out2["abab"] == ["ab", "ab"]


def test_pair_counts_weighted_by_freq(spark):
    df = spark.createDataFrame([("ab ab ab cd",)], "text string")
    tab = init_symbol_table(word_freq_table(df, "text"))
    counts = {(r["a"], r["b"]): r["cnt"] for r in pair_counts(tab).collect()}
    assert counts[("a", "b")] == 3
    assert counts[("c", "d")] == 1


@pytest.mark.slow
def test_bpe_encode_applies_merges_in_order(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, symtab = bpe_train(df, "text", n_merges=6)
    enc = {r["word"]: tuple(r["syms"]) for r in bpe_encode(df, "text", merges).collect()}
    final = {r["word"]: tuple(r["syms"]) for r in symtab.collect()}
    assert enc == final  # encoding the training corpus reproduces training state


# --- bigram stupid-backoff LM --------------------------------------------


def _ref_bigram_lm(texts: list[tuple[int, str]], alpha=0.4):
    toks = {i: _ref_tokenize(t) for i, t in texts}
    uni = Counter(w for ws in toks.values() for w in ws)
    big = Counter(
        (v, w) for ws in toks.values() for v, w in zip(ws, ws[1:])
    )
    N = sum(uni.values())
    out = {}
    for i, ws in toks.items():
        if not ws:
            continue
        lps = [math.log(uni[ws[0]] / N)]
        for v, w in zip(ws, ws[1:]):
            if (v, w) in big:
                lps.append(math.log(big[(v, w)] / uni[v]))
            else:
                lps.append(math.log(alpha * uni[w] / N))
        out[i] = (len(lps), sum(lps) / len(lps))
    return out


def test_bigram_lm_score_matches_reference(spark):
    rows = [(i, t) for i, t in enumerate(CORPUS + ["zzz unseen pair cat mat", ""])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["lm_score"])
        for r in bigram_lm_score(df, "text", "doc_id").collect()
    }
    ref = _ref_bigram_lm(rows)
    assert set(got) == set(ref)  # empty doc absent from both
    for k in ref:
        assert got[k][0] == ref[k][0]
        assert got[k][1] == pytest.approx(ref[k][1], rel=1e-9)


def test_bigram_lm_top_k_floors_oov(spark):
    rows = [(i, t) for i, t in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_lm_score(df, "text", "doc_id", top_k=3).collect()
    # all docs still scored, scores finite (no null-dropped tokens)
    assert len(out) == len(CORPUS)
    ref = _ref_bigram_lm(rows)
    for r in out:
        assert r["n_tokens"] == ref[r["doc_id"]][0]
        assert r["lm_score"] is not None and math.isfinite(r["lm_score"])


# --- DSIR importance weights ---------------------------------------------


def _md5_bucket_py(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n


def _ref_dsir(raw, target, n_buckets=64):
    def feats(rows):
        out = {}
        for i, t in rows:
            ws = _ref_tokenize(t)
            out[i] = [
                _md5_bucket_py(f"{v} {w}", n_buckets) for v, w in zip(ws, ws[1:])
            ]
        return {i: f for i, f in out.items() if f}

    rf, tf = feats(raw), feats(target)
    cr = Counter(b for f in rf.values() for b in f)
    ct = Counter(b for f in tf.values() for b in f)
    Nr, Nt = sum(cr.values()), sum(ct.values())
    lam = {
        b: math.log((ct.get(b, 0) + 1) / (Nt + n_buckets))
        - math.log((cr.get(b, 0) + 1) / (Nr + n_buckets))
        for b in set(cr) | set(ct)
    }
    return {
        i: (len(f), sum(lam[b] for b in f) / len(f)) for i, f in rf.items()
    }


def test_dsir_weights_match_reference(spark):
    raw = [(i, t) for i, t in enumerate(CORPUS + ["single", ""])]
    target = [(100, "the cat sat low"), (101, "newer newest banana")]
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_weight"])
        for r in dsir_weights(raw_df, tgt_df, "text", "doc_id", n_buckets=64).collect()
    }
    ref = _ref_dsir(raw, target, 64)
    assert set(got) == set(ref)  # <2-word docs absent
    for k in ref:
        assert got[k][0] == ref[k][0]
        assert got[k][1] == pytest.approx(ref[k][1], rel=1e-9)


def test_dsir_prefers_target_like_docs(spark):
    raw_rows = [(0, "the cat sat on the mat"), (1, "qqq www eee rrr ttt yyy")]
    tgt_rows = [(9, "the cat sat on a mat")]
    raw_df = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt_df = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(raw_df, tgt_df, "text", "doc_id", n_buckets=256).collect()
    }
    assert got[0] > got[1]


# --- deterministic shuffle -----------------------------------------------


def test_deterministic_shuffle_is_permutation_and_reproducible(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", salt="e1").collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", salt="e1").collect()]
    c = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", salt="e2").collect()]
    assert a == b  # reproducible
    assert sorted(a) == list(range(500))  # a permutation
    assert a != c  # new salt, new permutation
    assert a != list(range(500))  # actually shuffled


def test_deterministic_shuffle_range_partitioned_matches_global_sort(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    glob = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", "s").collect()]
    part = deterministic_shuffle(df, "doc_id", "s", n_partitions=8)
    # concatenating range partitions in order reproduces the global order
    got = [r["doc_id"] for r in part.toLocalIterator()]
    assert got == glob


def test_shuffle_positions_match_python_md5_order(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["pos"] for r in shuffle_positions(df, "doc_id", "s").collect()}
    ref_order = sorted(
        range(100), key=lambda i: (hashlib.md5(f"{i}s".encode()).hexdigest(), i)
    )
    ref = {i: p + 1 for p, i in enumerate(ref_order)}
    assert got == ref


# --- BM25 -----------------------------------------------------------------


def _ref_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {i: _ref_tokenize(t) for i, t in rows}
    lens = {i: len(ws) for i, ws in toks.items()}
    N = len(lens)
    avg = sum(lens.values()) / N
    tf = {i: Counter(w for w in ws if w in terms) for i, ws in toks.items()}
    dfreq = Counter(t for c in tf.values() for t in c)
    out = {}
    for i, c in tf.items():
        if not c:
            continue
        s = 0.0
        for t, f in c.items():
            idf = math.log(1.0 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (f * (k1 + 1)) / (f + k1 * (1 - b + b * lens[i] / avg))
        out[i] = s
    return out


def test_bm25_matches_reference(spark):
    from meds_polars_functions_spark.operators.text import bm25_scores

    rows = [(i, t) for i, t in enumerate(CORPUS + ["cat cat cat cat", "nothing here"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["cat", "low", "banana"], "text", "doc_id").collect()
    }
    ref = _ref_bm25(rows, {"cat", "low", "banana"})
    assert set(got) == set(ref)  # docs without query terms absent
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-9)
    # more occurrences of a term => higher score, saturating
    assert got[5] > got[0]  # "cat cat cat cat" beats one-cat doc


# --- hashed linear classifier --------------------------------------------


def _ref_linear_score(rows, weights, bias):
    out = {}
    n = len(weights)
    for i, t in rows:
        ws = _ref_tokenize(t)
        if not ws:
            continue
        feats = ws + [f"{v} {w}" for v, w in zip(ws, ws[1:])]
        mean_w = sum(weights[_md5_bucket_py(f, n)] for f in feats) / len(feats)
        out[i] = 1.0 / (1.0 + math.exp(-(bias + mean_w)))
    return out


def test_hashed_linear_score_matches_reference(spark):
    import numpy as np

    from meds_polars_functions_spark.operators.text import hashed_linear_score

    rows = [(i, t) for i, t in enumerate(CORPUS + ["single", ""])]
    weights = np.random.default_rng(3).uniform(-2, 2, 64).tolist()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clf_score"]
        for r in hashed_linear_score(df, "text", "doc_id", weights, bias=0.25).collect()
    }
    ref = _ref_linear_score(rows, weights, 0.25)
    assert set(got) == set(ref)  # zero-word doc absent
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-9)


@pytest.mark.slow
def test_hashed_logreg_training_separates_synthetic_labels(spark):
    """Full-batch GD on hashed features must learn to separate an
    obviously separable corpus, and the learned weights must plug
    straight into hashed_linear_score (shared feature definition)."""
    from meds_polars_functions_spark.operators.text import (
        hashed_linear_score,
        hashed_logreg_train,
    )

    pos_words = ["excellent", "great", "wonderful", "superb"]
    neg_words = ["terrible", "awful", "horrid", "dreadful"]
    rows = []
    for i in range(40):
        w = pos_words if i % 2 == 0 else neg_words
        text = " ".join(w[(i + j) % 4] for j in range(12))
        rows.append((i, text, 1.0 if i % 2 == 0 else 0.0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y double")
    w, b = hashed_logreg_train(
        df, "text", "y", "doc_id", n_buckets=32, n_iters=25, lr=4.0
    )
    scored = hashed_linear_score(df, "text", "doc_id", w, bias=b).join(
        df.select("doc_id", "y"), "doc_id"
    )
    rows = scored.collect()
    pos = [r["clf_score"] for r in rows if r["y"] == 1.0]
    neg = [r["clf_score"] for r in rows if r["y"] == 0.0]
    assert min(pos) > max(neg)
    assert sum(pos) / len(pos) > 0.8
    assert sum(neg) / len(neg) < 0.2


@pytest.mark.slow
def test_hashed_logreg_loss_decreases(spark):
    """More iterations must not hurt the training objective (full-batch
    GD with a small lr on a smooth convex loss)."""
    import math

    from meds_polars_functions_spark.operators.text import (
        hashed_linear_score,
        hashed_logreg_train,
    )

    rows = [
        (i, ("good stuff here truly " if i % 2 else "bad junk there really ") * 3,
         1.0 if i % 2 else 0.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y double")

    def loss(n_iters):
        w, b = hashed_logreg_train(
            df, "text", "y", "doc_id", n_buckets=32, n_iters=n_iters, lr=1.0
        )
        scored = hashed_linear_score(df, "text", "doc_id", w, bias=b).join(
            df.select("doc_id", "y"), "doc_id"
        )
        tot = 0.0
        for r in scored.collect():
            p = min(max(r["clf_score"], 1e-12), 1 - 1e-12)
            tot -= r["y"] * math.log(p) + (1 - r["y"]) * math.log(1 - p)
        return tot

    assert loss(10) < loss(1) < loss(0) + 1e-9


def test_bpe_encode_roundtrip_and_compression(spark):
    """Encoding with the learned merges must (1) concatenate back to
    the original word, (2) never exceed the char-split length, and
    (3) strictly compress words containing learned merges."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, symtab = bpe_train(df, "text", n_merges=8, checkpoint_every=3)
    enc = {r["word"]: r["syms"] for r in bpe_encode(df, "text", merges).collect()}
    trained = {r["word"]: tuple(r["syms"]) for r in symtab.collect()}
    assert set(enc) == set(trained)
    for w, syms in enc.items():
        assert "".join(syms) == w
        assert len(syms) <= len(w)
        # encoding fresh text with the merges == the trainer's final state
        assert tuple(syms) == trained[w]
    assert any(len(s) < len(w) for w, s in enc.items())


def test_top_pairs_batch_is_conflict_free_and_rank_ordered(spark):
    from meds_polars_functions_spark.operators.bpe import top_pairs

    texts = [("the cat sat on the mat while the dog dug a big rug",)] * 3
    df = spark.createDataFrame(texts, ["text"])
    tab = init_symbol_table(word_freq_table(df, "text"))
    batch = top_pairs(tab, 5)
    assert 1 <= len(batch) <= 5
    # pairwise-disjoint symbol sets
    used = set()
    for a, b, c in batch:
        assert a not in used and b not in used
        used.update((a, b))
        assert c >= 2
    # counts weakly decreasing in selection order
    cnts = [c for _, _, c in batch]
    assert cnts == sorted(cnts, reverse=True)
    # first element IS the sequential argmax (top_pair)
    from meds_polars_functions_spark.operators.bpe import top_pair

    assert top_pair(tab) == batch[0]


def test_bpe_train_batched_equals_sequential_on_disjoint_pairs(spark):
    # corpus engineered so the top merges touch disjoint symbols:
    # batched selection then provably equals sequential order.
    texts = [("aa bb cc dd " * 10,)] * 5
    df = spark.createDataFrame(texts, ["text"])
    seq, _ = bpe_train(df, "text", n_merges=4, batch_size=1)
    bat, _ = bpe_train(df, "text", n_merges=4, batch_size=4)
    assert seq == bat == [("a", "a"), ("b", "b"), ("c", "c"), ("d", "d")]


def test_bpe_train_batched_still_compresses(spark):
    # generic corpus: batched merges may reorder vs sequential (the
    # documented approximation) but must stay valid BPE — every merge
    # applies with count >= 2 and the encode round-trip compresses.
    texts = [
        ("hello yellow mellow fellow bellow",),
        ("the cellar dweller teller seller",),
        ("swelling spelling dwelling telling",),
    ] * 4
    df = spark.createDataFrame(texts, ["text"])
    merges, _ = bpe_train(df, "text", n_merges=12, batch_size=6)
    assert len(merges) == 12
    assert len(set(merges)) == 12  # no pair learned twice
    enc = bpe_encode(df, "text", merges)
    rows = {r["word"]: r["syms"] for r in enc.collect()}
    # "ell" words compress well below character count
    assert len(rows["yellow"]) < len("yellow")


def test_logreg_plan_size_constant_in_n_buckets(spark):
    # VERDICT r3: literal-array weights made plan size O(n_buckets·iters);
    # the broadcast (bucket, weight) table must keep it constant — the
    # 2^18-wide plan may not be materially larger than the 2^10 one.
    from meds_polars_functions_spark.operators.text import (
        _hashed_features,
        _logreg_margins,
    )

    rows = [(i, f"doc number {i} with words", float(i % 2)) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "text", "y"])

    def plan_len(n_buckets):
        feats = _hashed_features(df, "text", "id", "y", n_buckets)
        w = [0.1] * n_buckets  # worst case: every weight nonzero
        m = _logreg_margins(feats, w, 0.0)
        return len(m._jdf.queryExecution().analyzed().toString())

    small, big = plan_len(2**10), plan_len(2**18)
    assert big < 2 * small + 10_000, (small, big)


def test_hashed_logreg_trains_at_wide_bucket_count(spark):
    # the realistic hashing-trick width must actually run (one step)
    from meds_polars_functions_spark.operators.text import hashed_logreg_train

    rows = [(i, "good great fine" if i % 2 else "bad awful poor", float(i % 2))
            for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "text", "y"])
    w, b = hashed_logreg_train(df, "text", "y", "id", n_buckets=2**18, n_iters=2)
    assert len(w) == 2**18
    assert any(x != 0.0 for x in w)


def test_apply_merges_batch_equals_chained_single_merges(spark):
    from meds_polars_functions_spark.operators.bpe import (
        apply_merge,
        apply_merges,
        init_symbol_table,
    )

    rows = [("abcabd", 3), ("aabb", 2), ("xyxy", 5), ("ab", 1)]
    tab = init_symbol_table(spark.createDataFrame(rows, ["word", "freq"]))
    batch = [("a", "b"), ("x", "y")]  # conflict-free
    one_pass = {r["word"]: r["syms"] for r in apply_merges(tab, batch).collect()}
    chained = tab
    for a, b in batch:
        chained = apply_merge(chained, a, b)
    chained_out = {r["word"]: r["syms"] for r in chained.collect()}
    assert one_pass == chained_out
    assert one_pass["abcabd"] == ["ab", "c", "ab", "d"]
    assert one_pass["xyxy"] == ["xy", "xy"]


def test_top_pairs_merged_string_conflict_rule(spark):
    # the (a,b) + (ab,c) class: if "ab" is both a merged output and a
    # pre-existing symbol, batching them would diverge from sequential —
    # top_pairs must keep at most one of the two per batch.
    from meds_polars_functions_spark.operators.bpe import top_pairs

    # words where symbols a,b adjacent often AND (after no merges) the
    # candidate list contains pairs whose merged strings collide
    rows = [("abab", 10), ("abac", 10)]
    from meds_polars_functions_spark.operators.bpe import init_symbol_table

    tab = init_symbol_table(spark.createDataFrame(rows, ["word", "freq"]))
    batch = top_pairs(tab, 5)
    used: set[str] = set()
    for a, b, _ in batch:
        assert a not in used and b not in used and (a + b) not in used
        used.update((a, b, a + b))


# --- interpolated Kneser-Ney bigram LM ------------------------------------


def _ref_kneser_ney(rows, d=0.75):
    big = Counter()
    docs = {}
    for i, t in rows:
        ws = _ref_tokenize(t)
        if ws:
            docs[i] = ws
        for v, w in zip(ws, ws[1:]):
            big[(v, w)] += 1
    cv, n1v, n1w = Counter(), Counter(), Counter()
    for (v, w), c in big.items():
        cv[v] += c
        n1v[v] += 1
        n1w[w] += 1
    T = len(big)

    def pcont(w):
        return max(n1w.get(w, 0), 1) / T  # OOV-as-continuation floor 1/T

    out = {}
    for i, ws in docs.items():
        lps = [math.log(pcont(ws[0]))]
        for v, w in zip(ws, ws[1:]):
            p = max(big[(v, w)] - d, 0.0) / cv[v] + d * n1v[v] / cv[v] * pcont(w)
            lps.append(math.log(p))
        out[i] = (len(lps), sum(lps) / len(lps))
    return out


def test_kneser_ney_matches_reference(spark):
    from meds_polars_functions_spark.operators.text import kneser_ney_lm_score

    # "zzz" exercises the continuation floor: a word only ever document-
    # initial, never a continuation, so N1+(.,w) has no row for it
    rows = [(i, t) for i, t in enumerate(CORPUS + ["zzz", ""])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["lm_score"])
        for r in kneser_ney_lm_score(df, "text", "doc_id").collect()
    }
    ref = _ref_kneser_ney(rows)
    assert set(got) == set(ref)  # empty doc absent from both
    for k in ref:
        assert got[k][0] == ref[k][0]
        assert got[k][1] == pytest.approx(ref[k][1], rel=1e-9)


def test_kneser_ney_distribution_sums_to_one_per_context(spark):
    # the interpolated-KN invariant the smoothing exists for: for every
    # seen context v, sum over the continuation vocabulary of P(w|v) = 1
    rows = [(i, t) for i, t in enumerate(CORPUS)]
    big = Counter()
    for _, t in rows:
        ws = _ref_tokenize(t)
        for v, w in zip(ws, ws[1:]):
            big[(v, w)] += 1
    cv, n1v, n1w = Counter(), Counter(), Counter()
    for (v, w), c in big.items():
        cv[v] += c
        n1v[v] += 1
        n1w[w] += 1
    T, d = len(big), 0.75
    vocab = list(n1w)
    for v in cv:
        s = sum(
            max(big.get((v, w), 0) - d, 0.0) / cv[v]
            + d * n1v[v] / cv[v] * (n1w[w] / T)
            for w in vocab
        )
        assert s == pytest.approx(1.0, rel=1e-12)


def test_kneser_ney_penalizes_phrase_locked_words_vs_stupid_backoff(spark):
    from meds_polars_functions_spark.operators.text import kneser_ney_lm_score

    # "francisco" occurs often but only ever after "san" (the canonical
    # KN motivating example): its continuation probability is one type
    # out of T, so a doc using it in a NOVEL context scores lower than a
    # doc using an equally-frequent but context-diverse word there.
    rows = [(i, t) for i, t in enumerate(
        ["san francisco"] * 8
        + ["the cat", "a cat", "my cat", "one cat", "that cat", "his cat"]
    )]
    probe = [(900, "the francisco"), (901, "the cat")]
    df = spark.createDataFrame(rows + probe, "doc_id long, text string")
    got = {
        r["doc_id"]: r["lm_score"]
        for r in kneser_ney_lm_score(df, "text", "doc_id").collect()
    }
    assert got[900] < got[901]


def test_kneser_ney_top_k_floors_pruned_and_scores_all_docs(spark):
    from meds_polars_functions_spark.operators.text import kneser_ney_lm_score

    rows = [(i, t) for i, t in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = kneser_ney_lm_score(df, "text", "doc_id", top_k=3).collect()
    assert len(out) == len(CORPUS)  # pruning drops probabilities, not docs
    ref = _ref_kneser_ney(rows)
    for r in out:
        assert r["n_tokens"] == ref[r["doc_id"]][0]
        assert r["lm_score"] is not None and math.isfinite(r["lm_score"])
