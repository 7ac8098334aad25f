"""Property-based tests (hypothesis) for the engine's algebraic
invariants — the properties that must hold at any scale:

- aggregation mergeability: agg(shard1) ⊕ agg(shard2) == agg(all)
- keep-first dedup: matches a reference Python implementation
- union supertyping: diagonal concat never loses rows or columns
- minhash: signature similarity approximates true Jaccard
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

settings.register_profile(
    "spark",
    deadline=None,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
settings.load_profile("spark")

codes = st.sampled_from(["A", "B", "C//D", None])
vals = st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False))
row = st.tuples(st.integers(1, 5), codes, vals)


@given(st.lists(row, min_size=1, max_size=40))
@pytest.mark.slow
def test_agg_mergeable(spark, rows):
    df = spark.createDataFrame(
        [(p, None, c, v) for p, c, v in rows],
        "patient_id long, time timestamp, code string, numeric_value double",
    )
    from meds_polars_functions_spark.operators.aggregate_code_metadata import (
        aggregate_code_metadata,
        merge_pre_aggregated,
    )

    full = aggregate_code_metadata(df)
    h1 = aggregate_code_metadata(df.filter(F.col("patient_id") <= 2))
    h2 = aggregate_code_metadata(df.filter(F.col("patient_id") > 2))
    merged = merge_pre_aggregated([h1, h2])

    f = {r["code"]: r.asDict() for r in full.collect()}
    m = {r["code"]: r.asDict() for r in merged.collect()}
    assert set(f) == set(m)
    for code in f:
        for k in ("code/n_occurrences", "values/n_occurrences", "values/n_ints"):
            assert f[code][k] == m[code][k], (code, k)
        for k in ("values/sum", "values/sum_sqd"):
            assert math.isclose(f[code][k], m[code][k], rel_tol=1e-9, abs_tol=1e-9)
        for k in ("values/min", "values/max"):
            a, b = f[code][k], m[code][k]
            assert (a is None and b is None) or math.isclose(a, b, rel_tol=1e-9)
        # patient-disjoint shards: distinct counts are also mergeable
        assert f[code]["code/n_patients"] == m[code]["code/n_patients"]


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from("abc"), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
@pytest.mark.slow
def test_keep_first_matches_reference(spark, rows):
    from meds_polars_functions_spark.functions.expr import keep_first

    df = spark.createDataFrame(rows, "pid int, k string, v int")
    got = {
        (r["pid"], r["k"]): r["v"]
        for r in keep_first(df, ["pid", "k"], [F.col("v"), F.col("pid")]).collect()
    }
    expected: dict = {}
    for pid, k, v in sorted(rows, key=lambda t: (t[2], t[0])):
        expected.setdefault((pid, k), v)
    assert got == expected


@given(
    st.lists(st.tuples(st.integers(0, 5), st.floats(0, 1, allow_nan=False)), min_size=1, max_size=10),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), min_size=1, max_size=10),
)
@pytest.mark.slow
def test_union_relaxed_total_rows(spark, a_rows, b_rows):
    from meds_polars_functions_spark.operators.merge_sort import union_by_name_relaxed

    a = spark.createDataFrame(a_rows, "id int, v double")
    b = spark.createDataFrame(b_rows, "id int, w int")
    out = union_by_name_relaxed([a, b])
    assert out.count() == len(a_rows) + len(b_rows)
    assert set(out.columns) == {"id", "v", "w"}


def test_minhash_approximates_jaccard(spark):
    """Deterministic spot check: signature agreement rate ≈ Jaccard."""
    from meds_polars_functions_spark.operators.dedup import (
        jaccard_similarity,
        minhash_signature,
        word_shingles,
    )

    texts = [
        ("a", "the quick brown fox jumps over the lazy dog again and again"),
        ("b", "the quick brown fox jumps over the lazy cat again and again"),
        ("c", "completely different content about spark shuffles and joins"),
    ]
    df = spark.createDataFrame(texts, "id string, text string")
    sh = word_shingles("text", 3)
    out = df.select(
        "id",
        sh.alias("sh"),
        minhash_signature(sh, num_hashes=128).alias("sig"),
    ).collect()
    rows = {r["id"]: r for r in out}

    def sig_sim(x, y):
        return sum(a == b for a, b in zip(x, y)) / len(x)

    def true_jac(x, y):
        sx, sy = set(x), set(y)
        return len(sx & sy) / len(sx | sy)

    ab_true = true_jac(rows["a"]["sh"], rows["b"]["sh"])
    ab_est = sig_sim(rows["a"]["sig"], rows["b"]["sig"])
    assert abs(ab_true - ab_est) < 0.2
    ac_est = sig_sim(rows["a"]["sig"], rows["c"]["sig"])
    assert ac_est < 0.2


# --- BPE merge fold ------------------------------------------------------


def _py_merge(syms: list[str], a: str, b: str) -> list[str]:
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
    return out


sym = st.sampled_from(["a", "b", "c", "ab", "ba"])


@given(
    st.lists(st.lists(sym, min_size=0, max_size=8), min_size=1, max_size=12),
    sym,
    sym,
)
@pytest.mark.slow
def test_bpe_apply_merge_matches_python_greedy(spark, words, a, b):
    """The native aggregate-fold merge must equal the greedy
    leftmost-first Python merge on ANY symbol sequence (including
    overlap runs like a,a,a and empty arrays), and concatenating the
    merged symbols must reproduce the original string."""
    from meds_polars_functions_spark.operators.bpe import apply_merge

    rows = [(f"w{i}", 1, ws) for i, ws in enumerate(words)]
    tab = spark.createDataFrame(rows, "word string, freq long, syms array<string>")
    got = {r["word"]: r["syms"] for r in apply_merge(tab, a, b).collect()}
    for i, ws in enumerate(words):
        exp = _py_merge(ws, a, b)
        assert got[f"w{i}"] == exp
        assert "".join(got[f"w{i}"]) == "".join(ws)  # content preserved


def test_weighted_sample_determinism_and_weight_bias(spark):
    """Same (data, salt, k) => identical sample; heavier rows must be
    overrepresented (statistical, wide margin: weight ratio 100:1);
    zero-weight rows never selected; salt changes the draw."""
    from pyspark.sql import functions as F

    from meds_polars_functions_spark.operators.packing import weighted_sample

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(500)] + [(999, 0.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = {r["id"] for r in weighted_sample(df, "id", "w", 100, salt="x").collect()}
    b = {r["id"] for r in weighted_sample(df, "id", "w", 100, salt="x").collect()}
    assert a == b and len(a) == 100
    assert 999 not in a
    heavy = sum(1 for i in a if i < 50)
    # 50 heavy rows at 100x weight should nearly all be in a 100-sample
    assert heavy >= 40
    c = {r["id"] for r in weighted_sample(df, "id", "w", 100, salt="y").collect()}
    assert c != a


word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "zz"])
doc_words = st.lists(word, min_size=0, max_size=30)


@given(st.lists(doc_words, min_size=1, max_size=6))
@pytest.mark.slow
def test_cdc_chunks_tile_every_document(spark, docs):
    """Random corpora: CDC chunks are a contiguous, complete partition
    of each document's words; chunk hashes are reproducible."""
    from meds_polars_functions_spark.operators.dedup import cdc_chunks

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, "text", "doc_id", divisor=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    for i, ws in enumerate(docs):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        if not ws:
            assert chunks == []
            continue
        pos = 0
        for j, r in enumerate(chunks):
            assert r["chunk_idx"] == j and r["start_word"] == pos and r["n_words"] >= 1
            pos += r["n_words"]
        assert pos == len(ws)


@given(
    st.lists(word, min_size=8, max_size=8),
    st.lists(word, min_size=0, max_size=6),
    st.lists(word, min_size=0, max_size=6),
)
@pytest.mark.slow
def test_winnow_guarantee_property(spark, shared, pre, post):
    """For ANY shared run of window+k-1 = 8 words embedded in arbitrary
    prefix/suffix contexts, winnowing must select at least one common
    fingerprint for both documents (the scheme's coverage theorem)."""
    from meds_polars_functions_spark.operators.dedup import winnow_fingerprints

    t1 = " ".join(pre + shared + post)
    t2 = " ".join(list(reversed(post)) + ["qq", "ww"] + shared + ["rr"])
    df = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    fp = winnow_fingerprints(df, "text", "doc_id", k=4, window=5).collect()
    h1 = {r["fp_hash"] for r in fp if r["id"] == 1}
    h2 = {r["fp_hash"] for r in fp if r["id"] == 2}
    assert h1 & h2


def test_temperature_mixture_rates_and_determinism(spark):
    """alpha=0.5 downsamples the majority source toward sqrt-share,
    keeps every row of sources already under their target share, and is
    replay-deterministic (md5 buckets, no RNG)."""
    import pyspark.sql.functions as F

    from meds_polars_functions_spark.operators.packing import temperature_mixture

    rows = [(i, "big" if i < 800 else "small") for i in range(900)]
    df = spark.createDataFrame(rows, ["id", "src"])
    out = temperature_mixture(df, "src", "id", alpha=0.5)
    counts = {r["src"]: r["cnt"] for r in out.groupBy("src").agg(F.count("*").alias("cnt")).collect()}
    # small source is under its alpha-share target -> rate capped at 1, all kept
    assert counts["small"] == 100
    # big source's keep-rate = share * total / count < 1
    import math

    share = math.sqrt(800) / (math.sqrt(800) + math.sqrt(100))
    expected_rate = share * 900 / 800
    assert expected_rate < 1
    # md5 buckets are uniform-ish; allow generous binomial slack
    assert abs(counts["big"] / 800 - expected_rate) < 0.07
    again = temperature_mixture(df, "src", "id", alpha=0.5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_temperature_mixture_alpha_one_keeps_everything(spark):
    """alpha=1 with default target: every source's rate is exactly
    share*total/count = 1 -> identity filter."""
    from meds_polars_functions_spark.operators.packing import temperature_mixture

    rows = [(i, f"s{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, ["id", "src"])
    assert temperature_mixture(df, "src", "id", alpha=1.0).count() == 120


def test_temperature_mixture_target_total_scales_output(spark):
    from meds_polars_functions_spark.operators.packing import temperature_mixture

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "src"])
    out = temperature_mixture(df, "src", "id", alpha=0.5, target_total=200)
    n = out.count()
    assert 140 <= n <= 260  # ~200 expected, binomial slack


def test_span_dedup_is_idempotent(spark):
    """Property: span_dedup(span_dedup(X)) == span_dedup(X). After the
    first pass every surviving span is corpus-unique, so a second pass
    must be the identity — the fixed-point contract that makes the
    operator safe to re-run on partially-deduped corpora."""
    from meds_polars_functions_spark.operators.dedup import span_dedup

    words = [f"w{(i * 7) % 23}" for i in range(400)]
    rows = [
        (i, " ".join(words[(i * 13) % 80 : (i * 13) % 80 + 60]))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = span_dedup(df, "text", "doc_id", span_words=10)
    twice = span_dedup(once, "text", "doc_id", span_words=10)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_binned_quantiles_monotone_in_q(spark):
    """Property: estimates are non-decreasing in q for every group."""
    from meds_polars_functions_spark.functions.sketches import (
        binned_histogram,
        binned_quantiles,
    )

    rows = [(f"g{i % 3}", float((i * 37) % 997)) for i in range(3000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    hist = binned_histogram(df, "v", ["g"], lo=0.0, hi=1000.0, n_bins=100)
    qs = [0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]
    out = binned_quantiles(hist, qs, ["g"], lo=0.0, hi=1000.0, n_bins=100)
    got = {}
    for r in out.collect():
        got.setdefault(r["g"], []).append((r["q"], r["est"]))
    for g, pairs in got.items():
        ests = [e for _, e in sorted(pairs)]
        assert ests == sorted(ests), g
        assert len(pairs) == len(qs)


def test_temperature_mixture_monotone_in_alpha(spark):
    """Property: for the LARGEST source, the keep-rate (and so the kept
    count) is non-decreasing in alpha — alpha=1 keeps everything,
    smaller alpha shaves the head."""
    from meds_polars_functions_spark.operators.packing import temperature_mixture

    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "small")) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "src"])
    kept = []
    for alpha in (0.2, 0.5, 0.8, 1.0):
        out = temperature_mixture(df, "src", "id", alpha=alpha)
        kept.append(out.filter("src = 'big'").count())
    assert kept == sorted(kept)
    assert kept[-1] == 900


@given(
    st.lists(  # per-row ragged depth-1 column
        st.lists(st.floats(allow_nan=False, allow_infinity=False, width=64),
                 max_size=5),
        min_size=1, max_size=8,
    ),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_jnrt_roundtrip_property(col1, data):
    """save_jnrt∘load_jnrt_dense is the identity on co-ragged columns
    (depth-1 + a depth-2 column sharing the outer raggedness)."""
    import os
    import tempfile

    from meds_polars_functions_spark.sources._jnrt_numpy import (
        load_jnrt_dense,
        save_jnrt,
    )

    # depth-2 column co-ragged with col1 at the outer level
    col2 = [
        [
            data.draw(st.lists(
                st.floats(allow_nan=False, allow_infinity=False, width=64),
                max_size=4))
            for _ in row
        ]
        for row in col1
    ]
    with tempfile.TemporaryDirectory() as d:
        fp = os.path.join(d, "t.nrt")
        save_jnrt({"v": col1, "w": col2}, fp)
        dense = load_jnrt_dense(fp)
    assert dense["v"] == col1
    assert dense["w"] == col2


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=2, max_size=8,
    ),
    st.sampled_from([0.5, 0.8]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_containment_prefix_equals_baseline_property(spark, texts, t):
    """One-sided prefix filter is provably exact — check on random tiny
    'ab'-alphabet corpora, where shingle collisions are maximal."""
    from meds_polars_functions_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_prefix,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    base = sorted(map(tuple, containment_pairs(df, "text", "doc_id", threshold=t, shingle_n=2).collect()))
    pref = sorted(map(tuple, containment_pairs_prefix(df, "text", "doc_id", threshold=t, shingle_n=2).collect()))
    assert pref == base


@given(
    st.lists(
        st.text(alphabet="abc xy", min_size=0, max_size=60),
        min_size=1, max_size=10,
    ),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_span_dedup_drop_empty_false_preserves_rows_property(spark, texts):
    """ADVICE-fix contract: drop_empty=False NEVER loses a document,
    whatever mix of duplicates/empties the corpus holds."""
    from meds_polars_functions_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    out = span_dedup(df, "text", "doc_id", span_words=3, drop_empty=False)
    assert out.count() == len(texts)
    assert {r["doc_id"] for r in out.collect()} == set(range(len(texts)))


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=2, max_size=8,
    ),
    st.sampled_from([0.5, 0.8]),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_containment_minhash_sound_and_candidate_complete_property(spark, texts, t):
    """The composed scale path's two-sided contract on random tiny
    'ab'-alphabet corpora (maximal shingle collisions):

    SOUND — every emitted (id_a, id_b, containment) is a true directed
    containment pair: a subset of the exact baseline's output, with the
    value agreeing to 1e-9 (the hashed-shingle-set measure equals the
    string-shingle measure absent 2^-31 collisions, which the tiny
    alphabet cannot produce in 64-bit... but CAN in crc32 space — so
    compare against the baseline recomputed over the same hashed sets).

    CANDIDATE-COMPLETE — restricted to pairs sharing >= 1 LSH band
    (recomputed independently from the same signature table), the
    composed output loses nothing the exact measure keeps.
    """
    from meds_polars_functions_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_minhash,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["containment"], 9)
        for r in containment_pairs_minhash(
            df, "text", "doc_id", threshold=t, shingle_n=2
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): round(r["containment"], 9)
        for r in containment_pairs(
            df, "text", "doc_id", threshold=t, shingle_n=2
        ).collect()
    }
    # sound: nothing beyond the exact baseline, values identical.
    # (string-shingle and crc32-hashed-shingle containment agree unless
    # crc32 collides inside this tiny corpus — vanishingly unlikely and
    # hypothesis would surface it as a flaky example)
    for pair, c in got.items():
        assert pair in exact, (pair, c, exact)
        assert abs(c - exact[pair]) < 1e-9, (pair, c, exact[pair])
    # candidate-complete: an exact pair missing from the composed output
    # must be explained by LSH (no shared band), never by the verify step
    from meds_polars_functions_spark.operators.dedup import (
        _band_hash_udf,
        _bucket_pairs,
        _spread,
    )

    udf = _band_hash_udf(2, 64, 16, 42, frozenset(), with_shingles=False).asNondeterministic()
    banded = (
        _spread(df, None)
        .select(F.col("doc_id").alias("id"), udf(F.col("text")).alias("bands"))
        .select("id", F.posexplode("bands").alias("band_idx", "band_hash"))
    )
    cands = {
        (r["id_a"], r["id_b"])
        for r in _bucket_pairs(banded, ["band_idx", "band_hash"]).collect()
    }
    cands |= {(b, a) for a, b in cands}
    for pair in exact:
        if pair in cands:
            assert pair in got, (pair, exact[pair])


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=12),
        min_size=1, max_size=10,
    ),
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_kneser_ney_matches_python_reference_property(spark, word_lists):
    """KN scoring equals the sequential-Python reference on random tiny-
    vocabulary corpora (maximal bigram-table collisions: repeated words,
    single-word docs exercising the continuation floor, empty docs).
    Degenerate corpora with NO bigram anywhere are skipped — the model
    is undefined there (N1+(.,.) = 0) by documented contract."""
    import math as _math
    from collections import Counter as _Counter

    from meds_polars_functions_spark.operators.text import kneser_ney_lm_score

    texts = [" ".join(ws) for ws in word_lists]
    if not any(len(ws) >= 2 for ws in word_lists):
        return  # no bigram: T = 0, model undefined by contract
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["lm_score"])
        for r in kneser_ney_lm_score(df, "text", "doc_id").collect()
    }
    # sequential reference (mirrors tests/test_bpe_and_lm._ref_kneser_ney)
    big, docs = _Counter(), {}
    for i, ws in enumerate(word_lists):
        if ws:
            docs[i] = ws
        for v, w in zip(ws, ws[1:]):
            big[(v, w)] += 1
    cv, n1v, n1w = _Counter(), _Counter(), _Counter()
    for (v, w), c in big.items():
        cv[v] += c
        n1v[v] += 1
        n1w[w] += 1
    T, d = len(big), 0.75
    ref = {}
    for i, ws in docs.items():
        lps = [_math.log(max(n1w.get(ws[0], 0), 1) / T)]
        for v, w in zip(ws, ws[1:]):
            pc = max(n1w.get(w, 0), 1) / T
            lps.append(_math.log(max(big[(v, w)] - d, 0.0) / cv[v] + d * n1v[v] / cv[v] * pc))
        ref[i] = (len(lps), sum(lps) / len(lps))
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][0] == ref[k][0]
        assert got[k][1] == pytest.approx(ref[k][1], rel=1e-9)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=20,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_kmeans_distributed_lloyd_monotone_property(spark, points, k):
    """Lloyd monotonicity holds on ANY point set (duplicates, collinear,
    fewer distinct points than k): the inertia history never increases,
    and every iteration's assignment covers every input row."""
    from meds_polars_functions_spark.operators.similarity import (
        ivf_assign,
        kmeans_train_distributed,
    )

    rows = [(i, [float(x) for x in p]) for i, p in enumerate(points)]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cents, hist = kmeans_train_distributed(
        df, "v", k=k, n_iters=3, seed=5, id_col="vec_id"
    )
    assert len(cents) == min(k, len(points))  # init is a top-k over rows
    assert all(a >= b - 1e-9 for a, b in zip(hist, hist[1:]))
    out = ivf_assign(df, "v", cents, out_col="cell")
    assert out.count() == len(points)


@given(
    st.lists(doc_words, min_size=1, max_size=6),
    st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_prefix_paths_equal_baselines_on_random_corpora(spark, docs, t):
    """Fuzzed theorem-equality for the round-7 auto-dispatch family:
    on random tiny corpora (empty docs, duplicate docs, single-word
    docs — the boundary shapes the curated corpora never hit), the
    prefix-filtered Jaccard/containment joins and both forced branches
    of the auto dispatchers emit exactly the baseline pair sets."""
    from meds_polars_functions_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_auto,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_auto,
        shingle_expansion_diagnostic,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    diag = shingle_expansion_diagnostic(df, "text", "doc_id", shingle_n=2)

    def pairs(frame, score):
        return {
            (r["id_a"], r["id_b"], round(r[score], 9)) for r in frame.collect()
        }

    base_j = pairs(ngram_jaccard_pairs(df, "text", "doc_id", t, 2), "jaccard")
    for kw in (
        {"sump2_cutover": 0.0, "min_ratio": 0.0},  # forced prefix
        {"sump2_cutover": float("inf")},  # forced baseline
    ):
        got = pairs(
            ngram_jaccard_pairs_auto(
                df, "text", "doc_id", t, 2, diagnostic=diag, **kw
            ),
            "jaccard",
        )
        assert got == base_j, (t, kw)
    base_c = pairs(containment_pairs(df, "text", "doc_id", t, 2), "containment")
    for cut in (0.0, float("inf")):
        got = pairs(
            containment_pairs_auto(
                df, "text", "doc_id", t, 2, cutover=cut, t_split=0.0,
                diagnostic=diag,
            ),
            "containment",
        )
        assert got == base_c, (t, cut)


ov_row = st.tuples(
    st.integers(0, 2),        # group
    st.integers(0, 60),       # key
    st.booleans(),            # in A
    st.booleans(),            # in B
)


@given(st.lists(ov_row, min_size=1, max_size=60))
def test_bitmap_overlap_flags_equals_set_algebra(spark, rows):
    """bitmap_overlap_flags is EXACT set algebra on arbitrary flagged
    multisets: counts and inclusion-exclusion intersection equal plain
    Python set arithmetic per group; groups with no flagged rows never
    appear."""
    from meds_polars_functions_spark.functions.sketches import (
        bitmap_overlap_flags,
    )

    df = spark.createDataFrame(rows, "g long, k long, fa boolean, fb boolean")
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["n_union"], r["n_inter"])
        for r in bitmap_overlap_flags(df, ["g"], "k", "fa", "fb").collect()
    }
    want = {}
    for g in {r[0] for r in rows}:
        A = {k for gg, k, fa, fb in rows if gg == g and fa}
        B = {k for gg, k, fa, fb in rows if gg == g and fb}
        if A or B:
            want[g] = (len(A), len(B), len(A | B), len(A & B))
    assert got == want


strat_row = st.tuples(st.sampled_from(["x", "y", "z"]), st.integers(0, 500))


@given(
    st.lists(strat_row, min_size=1, max_size=60, unique_by=lambda t: t[1]),
    st.floats(0.0, 1.0),
)
@pytest.mark.slow
def test_stratified_sample_exact_targets_any_fraction(spark, rows, frac):
    """For ANY fraction, every stratum contributes exactly
    max(ceil(frac*n_s), min(2, n_s)) rows and the selection is the md5
    bottom-k (prefix-stability: the chosen ids are the k smallest under
    the salt order, so raising the fraction only ADDS rows)."""
    import hashlib
    import math as m

    from meds_polars_functions_spark.operators.packing import stratified_sample

    df = spark.createDataFrame(rows, "g string, id long")
    out = stratified_sample(df, ["g"], "id", frac, salt="p", min_per_stratum=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["g"], set()).add(r["id"])
    sizes = {}
    for g, i in rows:
        sizes[g] = sizes.get(g, 0) + 1
    for g, n in sizes.items():
        k = max(m.ceil(n * frac), min(n, 2))
        ids = sorted(
            (i for gg, i in rows if gg == g),
            key=lambda i: (hashlib.md5(f"{i}p".encode()).hexdigest(), i),
        )
        assert got.get(g, set()) == set(ids[:k]), (g, frac)
