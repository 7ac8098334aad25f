"""Time individual queries solo, N repetitions, with warm session.

Usage: python scripts/solo_time.py q1 q2 ... [--reps N] [--noop]
Prints JSON {query: [sec, ...]}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from meds_polars_functions_spark.session import get_spark


def main() -> None:
    # accept both `--reps=N` and `--reps N` (ADVICE r15: the space form
    # was silently ignored and N was treated as a query name)
    argv = sys.argv[1:]
    reps = 3
    rest: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a == "--reps" and i + 1 < len(argv):
            reps = int(argv[i + 1])
            i += 1
        else:
            rest.append(a)
        i += 1
    args = [a for a in rest if not a.startswith("--")]
    use_noop = "--noop" in rest
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("solo_time")
    queries = entry_mod.queries()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    entry_mod._t(spark, sf_dir, "lineitem").count()
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    par = spark.sparkContext.defaultParallelism
    spark.range(0, 10 * par, 1, par).select(_noop("id")).count()

    out = {}
    for name in args:
        fn = queries[name]
        times = []
        for _ in range(reps):
            # round 15: several operators persist compact intermediates;
            # CacheManager matches canonically-equal plans SESSION-wide,
            # so without this a rep would read the previous rep's cache
            # and report a fake warm time. Every rep recomputes from
            # parquet, like the driver's fresh-process bench.
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"solo:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.time() - t0, 3))
        out[name] = times
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
