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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    use_noop = "--noop" in sys.argv
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
