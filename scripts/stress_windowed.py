"""x N scaling-shape stress for the round-14 STAGED windowed-sketch-state
pair (q_windowed_user_retention + q_windowed_hll_retention) — same
discipline as stress_overlap.py: warm first, noop sink, one session,
blown-up copies from stress_scale's materialize (id-offset-disjoint, so
the x16 corpus has 16x the users per (group, window) and 16x the rows;
the window COUNT stays fixed at ~30 days x 5 types, so the state table
grows only in per-cell population — the shape the family claims).

Usage: python scripts/stress_windowed.py [N_COPIES] [SCRATCH_DIR]
Defaults: 16, /tmp/spark_graft_stress. Prints one JSON line per dataset.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from meds_polars_functions_spark.session import get_spark
from scripts.stress_scale import ensure_scratch

SF_DIR = "/root/testdata/sf0.01"


def run(spark, sf_dir: str, label: str) -> None:
    timings = {}
    for name in ("windowed_user_retention", "windowed_hll_retention"):
        q = em.staged_queries().get(name) or em._registry()[name]
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {"dataset": label, "total": round(sum(timings.values()), 3),
             "queries": timings}
        ),
        flush=True,
    )


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_stress"
    spark = get_spark()
    ensure_scratch(spark, SF_DIR, scratch, n_copies)
    run(spark, SF_DIR, "warm")  # JIT/codegen warmup, discarded
    run(spark, SF_DIR, "sf0.01_x1")
    run(spark, scratch, f"sf0.01_x{n_copies}")


if __name__ == "__main__":
    main()
