"""Dump .explain('formatted') for the given queries (default: all bench
queries) to a directory.

Usage: python scripts/dump_plans.py OUTDIR [q1 q2 ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from meds_polars_functions_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    queries = entry_mod.queries()
    if not names:
        import bench

        names = bench.HEADLINE + bench.TRACKED
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {exc}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:200])
    spark.stop()


if __name__ == "__main__":
    main()
