"""Interleaved same-session A/B (the only trustworthy methodology on
this shared box — see SCALE.md METHOD): exact directed-containment
posting join (`containment_pairs`) vs the composed scale path
(`containment_pairs_minhash`, VERDICT r4 item 5: minhash-LSH candidates
-> exact containment verify) on the ×N blown-up sf0.1 documents table,
at t=0.5 and t=0.8.

Usage: python scripts/ab_containment_scale.py [N_COPIES] [ROUNDS] [SCRATCH_DIR]
Defaults: 16 copies, 2 interleaved rounds, /tmp/spark_graft_stress_cont.
Prints one JSON line per (round, variant, threshold) and a summary.

Note the variants are NOT output-identical (documented in the operator:
LSH recall is jaccard-governed), so this also reports the directed-pair
recall of the composed path against the exact baseline at each
threshold — the speed number only matters alongside it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from meds_polars_functions_spark.operators.dedup import (
    containment_pairs,
    containment_pairs_minhash,
)
from meds_polars_functions_spark.session import get_spark
from scripts.stress_scale import materialize


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    scratch = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_stress_cont"

    spark = get_spark("ab_containment")
    em._prep(spark)
    if not os.path.exists(f"{scratch}/documents.parquet"):
        t0 = time.time()
        materialize(spark, "/root/testdata/sf0.1", scratch, n_copies)
        print(json.dumps({"materialize_sec": round(time.time() - t0, 3)}), flush=True)

    docs = em._t(spark, scratch, "documents")

    def run(variant: str, t: float) -> float:
        fn = containment_pairs if variant == "exact" else containment_pairs_minhash
        t0 = time.time()
        fn(docs, "text", "doc_id", threshold=t).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    # warm both paths once (JIT/codegen/broadcast caches), then interleave
    for t in (0.5, 0.8):
        run("exact", t)
        run("minhash", t)
    results: dict[str, list[float]] = {}
    for r in range(rounds):
        for t in (0.5, 0.8):
            for variant in ("exact", "minhash"):
                sec = run(variant, t)
                results.setdefault(f"{variant}@t={t}", []).append(sec)
                print(
                    json.dumps({"round": r, "variant": variant, "t": t, "sec": sec}),
                    flush=True,
                )

    # recall of the composed path vs the exact baseline (directed pairs)
    recall = {}
    for t in (0.5, 0.8):
        exact_pairs = {
            (r["id_a"], r["id_b"])
            for r in containment_pairs(docs, "text", "doc_id", threshold=t).collect()
        }
        mh_pairs = {
            (r["id_a"], r["id_b"])
            for r in containment_pairs_minhash(
                docs, "text", "doc_id", threshold=t
            ).collect()
        }
        recall[f"t={t}"] = {
            "exact_pairs": len(exact_pairs),
            "minhash_pairs": len(mh_pairs),
            "recall": round(len(exact_pairs & mh_pairs) / max(len(exact_pairs), 1), 4),
            "extra": len(mh_pairs - exact_pairs),
        }
    summary = {
        k: {"min": min(v), "median": sorted(v)[len(v) // 2]} for k, v in results.items()
    }
    print(json.dumps({"summary": summary, "recall": recall}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
