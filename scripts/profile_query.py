"""Profile one or more queries with the Spark event log: per-job wall
time, stage task-time totals, and stage-level shuffle bytes.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_query.py q1 [q2 ...]
Prints a per-query summary of jobs (description, wall) and the heaviest
stages (name, task time, shuffle read/write).
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from meds_polars_functions_spark.session import get_spark

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
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

    marks = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        df.count()
        marks[name] = round(time.time() - t0, 3)
    spark.stop()

    ev = sorted(glob.glob(f"{EVDIR}/*"))[-1]
    if os.path.isdir(ev):
        cand = [p for p in glob.glob(f"{ev}/events_*") or glob.glob(f"{ev}/*") if os.path.isfile(p)]
        ev = sorted(cand)[-1]
    jobs = {}
    stages = {}
    with open(ev) as fh:
        for line in fh:
            e = json.loads(line)
            t = e.get("Event")
            if t == "SparkListenerJobStart":
                desc = e.get("Properties", {}).get("spark.job.description", "")
                jobs[e["Job ID"]] = {
                    "desc": desc,
                    "start": e["Submission Time"],
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                }
            elif t == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["wall"] = (
                        e["Completion Time"] - jobs[e["Job ID"]]["start"]
                    ) / 1000.0
            elif t == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                acc = {a["Name"]: a for a in si.get("Accumulables", [])}

                def val(n):
                    a = acc.get(n)
                    return a.get("Value", 0) if a else 0

                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "wall": (
                        (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                        / 1000.0
                        if si.get("Submission Time")
                        else 0
                    ),
                    "task_time": val("internal.metrics.executorRunTime") / 1000.0,
                    "sh_read": val("internal.metrics.shuffle.read.remoteBytesRead")
                    + val("internal.metrics.shuffle.read.localBytesRead"),
                    "sh_write": val("internal.metrics.shuffle.write.bytesWritten"),
                }

    for name in names:
        tag = f"Q:{name}"
        qjobs = [j for j in jobs.values() if j["desc"] == tag]
        print(f"\n=== {name}: wall={marks[name]}s  jobs={len(qjobs)}")
        sids = [s for j in qjobs for s in j["stages"]]
        done = [(sid, stages[sid]) for sid in sids if sid in stages]
        skipped = len(sids) - len(done)
        total_wall = sum(j.get("wall", 0) for j in qjobs)
        print(
            f"  job wall sum={total_wall:.2f}s  stages submitted={len(done)}"
            f" skipped={skipped}"
        )
        done.sort(key=lambda kv: -kv[1]["wall"])
        for sid, s in done[:12]:
            print(
                f"  stage {sid}: wall={s['wall']:.2f}s task_time={s['task_time']:.2f}s"
                f" tasks={s['tasks']} shR={s['sh_read']//1024}K shW={s['sh_write']//1024}K  {s['name']}"
            )


if __name__ == "__main__":
    main()
