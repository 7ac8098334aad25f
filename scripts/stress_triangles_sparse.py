"""Sparse-graph triangles stress row (VERDICT r4 item 6): the tracked
`triangles` number runs the co-SUPPLIER graph, which at sf0.1 is 90.8%
dense (near-clique, 1.2e8 real triangles) — output-bound enumeration, an
adversarial case that says nothing about the degree-orientation design.
This script times the same `triangle_count` operator on the co-PART
graph (parts sharing an order: ~20k vertices / ~1.2M edges / 0.6%
density at sf0.1), the regime the O(sqrt(E)) wedge-fan-out cap targets,
at sf0.1 and on the ×N blown-up copy.

Usage: python scripts/stress_triangles_sparse.py [N_COPIES] [SCRATCH_DIR]
Defaults: 16, /tmp/spark_graft_stress_cont (shared with
ab_containment_scale.py; materialized here if missing).
Prints one JSON line per dataset with graph shape + wall seconds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as em
from meds_polars_functions_spark.operators.graph import triangle_count
from meds_polars_functions_spark.session import get_spark
from scripts.stress_scale import ensure_scratch


def co_part_edges(spark, sf_dir: str):
    li = em._t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )


def run(spark, sf_dir: str, label: str) -> None:
    edges = co_part_edges(spark, sf_dir)
    ne = edges.count()
    nv = edges.select(F.explode(F.array("src", "dst")).alias("v")).distinct().count()
    t0 = time.time()
    tri = triangle_count(edges).collect()[0][0]
    sec = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "dataset": label,
                "edges": ne,
                "vertices": nv,
                "density": round(2 * ne / (nv * (nv - 1)), 6),
                "triangles": tri,
                "sec": sec,
            }
        ),
        flush=True,
    )


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_stress_cont"
    spark = get_spark("stress_tri_sparse")
    em._prep(spark)
    # shared source+copy-count marker guard (ADVICE r12 item 4)
    ensure_scratch(spark, "/root/testdata/sf0.1", scratch, n_copies)
    run(spark, "/root/testdata/sf0.1", "warmup@sf0.1")
    run(spark, "/root/testdata/sf0.1", "sf0.1")
    run(spark, scratch, f"sf0.1x{n_copies}")
    spark.stop()


if __name__ == "__main__":
    main()
