"""×N stress rows for the round-5 STAGED operators (kneser_ney_lm exact
+ top_k mode, kmeans_cells) — same discipline as stress_scale.py: warm
first, noop sink, one session, blown-up copies from stress_scale's
materialize (id-offset-disjoint).

Usage: python scripts/stress_staged.py [N_COPIES] [SCRATCH_DIR]
Defaults: 16, /tmp/spark_graft_stress (materialized here if missing).
Prints one JSON line per dataset.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

import __spark_entry__ as em
from meds_polars_functions_spark.operators.text import kneser_ney_lm_score
from meds_polars_functions_spark.session import get_spark
from scripts.stress_scale import ensure_scratch


def run(spark, sf_dir: str, label: str) -> None:
    timings = {}
    t0 = time.time()
    em.q_kneser_ney_lm(spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings["kneser_ney_lm"] = round(time.time() - t0, 3)
    docs = em._t(spark, sf_dir, "documents")
    t0 = time.time()
    kneser_ney_lm_score(docs, "text", "doc_id", top_k=50_000).write.format(
        "noop"
    ).mode("overwrite").save()
    timings["kneser_ney_topk50k"] = round(time.time() - t0, 3)
    t0 = time.time()
    em.q_kmeans_cells(spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings["kmeans_cells"] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {"dataset": label, "total": round(sum(timings.values()), 3), "queries": timings}
        ),
        flush=True,
    )


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_stress"
    src = "/root/testdata/sf0.1"
    spark = get_spark("stress_staged")
    em._prep(spark)

    # shared source+copy-count marker guard (ADVICE r12 item 4): the
    # default scratch path is shared with the sf0.01-sourced stress
    # scripts, so identity must include the source dir
    t0 = time.time()
    ensure_scratch(spark, src, scratch, n_copies)
    print(
        json.dumps(
            {"materialize_sec": round(time.time() - t0, 3), "copies": n_copies}
        ),
        flush=True,
    )

    run(spark, src, "warmup@sf0.1")
    run(spark, src, "sf0.1")
    run(spark, scratch, f"sf0.1x{n_copies}")
    spark.stop()


if __name__ == "__main__":
    main()
