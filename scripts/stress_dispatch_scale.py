"""Scale-validation of the auto-dispatch cutover constants (VERDICT r7
item 1 — the one open design risk).

The round-7 crossover table calibrated `AUTO_PREFIX_EXPANSION_CUTOVER`
(jaccard, ratio 28) and `CONTAINMENT_T_SPLIT`/`CONTAINMENT_RATIO_CUTOVER`
(0.65 / 5.0) on 10k-30k-doc corpora. The open question: does the measured
crossover RATIO move when the corpus grows 16x at FIXED expansion ratio?
(At fixed ratio both the baseline's ~Sigma f^2/2 candidate rows and the
prefix path's posting+window rows grow linearly with corpus size, so the
first-order prediction is scale-invariance; what could move it are
second-order effects — shuffle spill, the rank window's sort going
out-of-cache, scheduler overhead amortization.)

Method (SCALE.md METHOD): per corpus, ONE warm Spark session; each
(family, t) cell runs baseline/prefix interleaved, 1 warm + N recorded
rounds, noop sink; outputs asserted pair-identical once per cell before
timing. Corpora come from ab_prefix_diverse.diverse_docs with the
template count chosen to BRACKET each dispatch boundary:

    jaccard boundary (cutover 28):     ratio ~10 and ~30
    containment boundary (cutover 5):  ratio ~5 at t = 0.8 (>= t_split)

and the 16x corpora hold n_docs/n_templates constant so the expansion
ratio is preserved while volume grows 16x.

Usage: python scripts/stress_dispatch_scale.py [--scale 1|16] [--vocab-scale]
                                               [--append] [--cell NAME ...]
Cells: j10, j30, c5 (default: all three at the given scale).
--vocab-scale grows the vocabulary with volume so the expansion ratio
stays at its 1x value (isolates "same ratio, 16x volume"); without it
the fixed vocab lets the ratio drift up with n_docs, which conflates
the two candidate dispatch signals.
--append: if the cell's record file already exists, keep its samples and
append this session's recorded rounds (round indices continue), then
recompute the medians over ALL samples — for thickening a thin cell
(VERDICT r8 item 3) without discarding the prior session's evidence.
Sessions are tagged in each appended sample so provenance survives.
Env: DISPATCH_ROUNDS (recorded rounds, default 2).

Raw samples land in records/dispatch_scale_<cell>_<scale>x.json
(VERDICT r7 item 4: medians must be auditable).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_prefix_diverse import GEN_VERSION, SEED, diverse_docs, uniform_docs  # noqa: E402

from meds_polars_functions_spark.operators.dedup import (  # noqa: E402
    containment_pairs,
    containment_pairs_prefix,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    shingle_expansion_diagnostic,
)
from meds_polars_functions_spark.session import get_spark  # noqa: E402

N_ROUNDS = int(os.environ.get("DISPATCH_ROUNDS", "2"))
BASE_DOCS = 30_000
VOCAB = 200_000

#: template counts chosen (diagnostic-probed at 30k docs: ratio fits
#: 1.9 + 10820/T almost exactly) to land the expansion ratio near each
#: dispatch boundary; the 16x corpora scale n_templates with n_docs so
#: per-template frequency — hence the ratio — is preserved.
CELLS = {
    "j10": {"n_templates": 1336, "family": "jaccard", "ts": [0.5, 0.8]},
    "j30": {"n_templates": 385, "family": "jaccard", "ts": [0.5, 0.8]},
    "c5": {"n_templates": 3490, "family": "containment", "ts": [0.8]},
    # the sub-cutover corner: ratio ~4.4 at 16x-vs volume, where the
    # containment ratio rule (>= 5 -> prefix) picks BASELINE — measures
    # whether low-ratio/high-volume flips like the jaccard family did
    "c3": {"n_templates": 8300, "family": "containment", "ts": [0.8]},
    # same corpus, jaccard family: at 16x-vs this sits at ratio ~4.9 with
    # sum_p2 ~3.7e8 — JUST above the volume cutover but under the
    # min_ratio=8 guard, so the dispatcher picks baseline on the guard
    # alone. Measures whether the theory-driven guard calls the winner.
    "j5": {"n_templates": 8300, "family": "jaccard", "ts": [0.5, 0.8]},
    # NON-Zipfian sanity cells (VERDICT r8 item 4): uniform_docs corpora
    # — flat bimodal shingle frequencies, no Zipf tail — bracketing the
    # 3.6e8 volume cutover from each side at ratio >> min_ratio, so the
    # volume rule alone decides. Σf² ≈ 28·n²/T: at n=120k docs, T=806
    # lands ~5e8 (dispatcher -> prefix), T=1680 lands ~2.4e8
    # (dispatcher -> baseline). Run at --scale 1 (n_docs is explicit).
    "ju_hi": {"n_templates": 806, "family": "jaccard", "ts": [0.5, 0.8],
              "shape": "uniform", "n_docs": 120_000},
    "ju_lo": {"n_templates": 1680, "family": "jaccard", "ts": [0.5, 0.8],
              "shape": "uniform", "n_docs": 120_000},
    # NON-Zipfian containment cells: the r9 CONTAINMENT_RATIO_CUTOVER
    # re-calibration (8.0) rests on Zipfian cells only — the same shape
    # risk the jaccard rule failed. Empirically Σf² ≈ 8.7e11/T on the
    # 120k uniform corpora and ratio = Σf²/19.0M postings: T=7600 lands
    # ratio ~6 (dispatcher -> baseline), T=4150 lands ratio ~11
    # (dispatcher -> prefix). t=0.8 only (the t >= t_split regime).
    "cu_lo": {"n_templates": 7600, "family": "containment", "ts": [0.8],
              "shape": "uniform", "n_docs": 120_000},
    "cu_hi": {"n_templates": 4150, "family": "containment", "ts": [0.8],
              "shape": "uniform", "n_docs": 120_000},
}

VARIANTS = {
    ("containment", "baseline"): containment_pairs,
    ("containment", "prefix"): containment_pairs_prefix,
    ("jaccard", "baseline"): ngram_jaccard_pairs,
    ("jaccard", "prefix"): ngram_jaccard_pairs_prefix,
}


def corpus(spark, n_docs: int, n_templates: int, vocab: int = VOCAB,
           shape: str = "zipf"):
    gen, tag = (uniform_docs, "uniform") if shape == "uniform" else (
        diverse_docs, "diverse")
    scratch = (
        f"/tmp/spark_graft_{tag}_v{GEN_VERSION}_s{SEED}"
        f"_{n_docs}_{vocab}_{n_templates}"
    )
    if not os.path.exists(scratch):
        gen(spark, n_docs, vocab, n_templates).write.mode(
            "overwrite"
        ).parquet(scratch)
    return spark.read.parquet(scratch)


def main() -> None:
    args = sys.argv[1:]
    scale = 1
    if "--scale" in args:
        i = args.index("--scale")
        scale = int(args[i + 1])
        del args[i : i + 2]
    # --vocab-scale: scale the vocabulary with volume (Heaps-law-style) so
    # per-shingle frequencies — hence the expansion ratio — stay at their
    # 1x values while volume grows. Without it, fixed vocab makes the
    # ratio itself drift up with n_docs (measured: 9.9 -> 17.5 at 16x),
    # which is realistic for template frequency but conflates the two
    # dispatch signals; the vocab-scaled cells isolate "same ratio,
    # 16x volume".
    vocab_scaled = "--vocab-scale" in args
    if vocab_scaled:
        args.remove("--vocab-scale")
    append = "--append" in args
    if append:
        args.remove("--append")
    cells = [a for a in args if a != "--cell"] or list(CELLS)

    spark = get_spark("dispatch_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    for cell in cells:
        spec = CELLS[cell]
        n_docs = spec.get("n_docs", BASE_DOCS) * scale
        n_templates = spec["n_templates"] * scale
        vocab = VOCAB * (scale if vocab_scaled else 1)
        docs = corpus(spark, n_docs, n_templates, vocab,
                      shape=spec.get("shape", "zipf"))
        diag = shingle_expansion_diagnostic(docs, "text", "doc_id")
        shape = spec.get("shape", "zipf")
        print(json.dumps({"cell": cell, "scale": scale, "n_docs": n_docs,
                          "n_templates": n_templates, "vocab": vocab,
                          "shape": shape, **diag}), flush=True)

        family = spec["family"]
        record = {"cell": cell, "scale": scale, "n_docs": n_docs,
                  "n_templates": n_templates, "vocab": vocab,
                  "shape": shape, "diagnostic": diag,
                  "rounds": N_ROUNDS, "samples": [], "summary": {}}

        def run(t: float, variant: str) -> float:
            fn = VARIANTS[(family, variant)]
            t0 = time.time()
            fn(docs, "text", "doc_id", threshold=t).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.time() - t0, 3)

        for t in spec["ts"]:
            a = VARIANTS[(family, "baseline")](docs, "text", "doc_id", threshold=t).count()
            b = VARIANTS[(family, "prefix")](docs, "text", "doc_id", threshold=t).count()
            assert a == b, (cell, t, a, b)
            print(json.dumps({"cell": cell, "t": t, "pairs": a,
                              "identical": True}), flush=True)
            for variant in ("baseline", "prefix"):  # warm both plans
                run(t, variant)
            results: dict[str, list[float]] = {"baseline": [], "prefix": []}
            for r in range(N_ROUNDS):
                for variant in ("baseline", "prefix"):
                    sec = run(t, variant)
                    results[variant].append(sec)
                    record["samples"].append({"round": r, "t": t,
                                              "variant": variant, "sec": sec})
                    print(json.dumps(record["samples"][-1]), flush=True)
            med = {v: sorted(xs)[len(xs) // 2] for v, xs in results.items()}
            delta = round(100 * (med["prefix"] - med["baseline"]) / med["baseline"], 1)
            record["summary"][f"t{t}"] = {**med, "prefix_vs_baseline_pct": delta}
            print(json.dumps({"cell": cell, "scale": scale, "t": t, **med,
                              "prefix_vs_baseline_pct": delta}), flush=True)

        os.makedirs(os.path.join(REPO, "records"), exist_ok=True)
        suffix = "x_vs" if vocab_scaled else "x"
        out = os.path.join(REPO, "records", f"dispatch_scale_{cell}_{scale}{suffix}.json")
        if append and os.path.exists(out):
            with open(out) as fh:
                prior = json.load(fh)
            # sanity: only merge records of the SAME cell settings
            # (records written before a key existed — e.g. round-8 files
            # predate "vocab"/"shape" — skip that key rather than crash
            # after the measurement has already run)
            for key in ("cell", "scale", "n_docs", "n_templates", "vocab"):
                if key in prior and prior[key] != record[key]:
                    # SystemExit, not assert: the check must survive
                    # python -O, and it fires AFTER the expensive
                    # measurement — a silent merge of mismatched cells
                    # would poison the dispatch-constant evidence.
                    raise SystemExit(
                        f"--append refuses to merge: {key!r} differs "
                        f"(prior={prior[key]!r}, new={record[key]!r}) in {out}"
                    )
            session = 1 + max(
                (s.get("session", 0) for s in prior["samples"]), default=0
            )
            base_round = 1 + max(
                (s["round"] for s in prior["samples"]), default=0
            )
            for s in record["samples"]:
                s["round"] += base_round
                s["session"] = session
            record["samples"] = prior["samples"] + record["samples"]
            record["rounds"] = prior["rounds"] + N_ROUNDS
            # medians over ALL samples, all sessions
            for t_key in record["summary"]:
                t_val = float(t_key[1:])
                med = {}
                for variant in ("baseline", "prefix"):
                    xs = sorted(
                        s["sec"] for s in record["samples"]
                        if s["t"] == t_val and s["variant"] == variant
                    )
                    med[variant] = xs[len(xs) // 2]
                delta = round(
                    100 * (med["prefix"] - med["baseline"]) / med["baseline"], 1
                )
                record["summary"][t_key] = {
                    **med, "prefix_vs_baseline_pct": delta,
                }
                print(json.dumps({"cell": cell, "t": t_val, "merged": True,
                                  **record["summary"][t_key]}), flush=True)
        with open(out, "w") as fh:
            json.dump(record, fh, indent=1)
        print(f"raw samples -> {out}", flush=True)


if __name__ == "__main__":
    main()
