"""Local mirror of the driver's correctness gate: run each __spark_entry__
query against its DuckDB oracle and compare row count + order-insensitive
values. Usage: python scripts/compare_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import math
import os
import sys
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from meds_polars_functions_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_val(v):
    """Mirror the DRIVER's value canonicalizer, which DISTINGUISHES int 1
    from float 1.0 (the round-4 red-row class: DuckDB HUGEINT aggregates
    land in pandas as float64 while Spark returns int64 — bit-identical
    values, different hash). Floats and Decimals are tagged ("f", ...),
    bools ("b", ...), ints pass untagged — so an int-vs-float dtype skew
    fails HERE exactly as it fails at the driver. The previous version
    normalized numerics to equality (Python 1 == 1.0), which is why three
    local 165/165 sweeps coexisted with two driver reds in round 4."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, (np.ndarray, pd.Series)):
        return tuple(_norm_val(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _normalize(pdf):
    cols = sorted(pdf.columns)
    rows = []
    for t in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm_val(v) for v in t))
    return cols, sorted(rows, key=repr)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if os.environ.get("ORACLE_DRIVER_DEFAULTS"):
        # Simulate the driver's session: stock Spark 4 defaults (ANSI ON,
        # no pinned zone) — queries must self-defend via their _prep().
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").appName(
            "oracle_compare_defaults"
        ).getOrCreate()
    else:
        spark = get_spark("oracle_compare")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            results[name] = "SPARK_ERROR"
            traceback.print_exc()
            continue
        if name not in oracles:
            results[name] = f"rows_only({len(sdf)})"
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            results[name] = "ORACLE_ERROR"
            traceback.print_exc()
            continue
        scols, srows = _normalize(sdf)
        ocols, orows = _normalize(odf)
        if scols != ocols:
            results[name] = f"COLS_MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"COUNT_MISMATCH spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            diffs = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            results[name] = f"VALUES_MISMATCH n={sum(1 for a, b in zip(srows, orows) if a != b)} first={diffs}"
        else:
            results[name] = f"OK({len(srows)})"

    print("\n=== ORACLE COMPARE RESULTS ===")
    n_ok = 0
    for name, status in results.items():
        flag = "PASS" if status.startswith(("OK", "rows_only")) else "FAIL"
        n_ok += flag == "PASS"
        print(f"{flag:4s} {name:36s} {status[:240]}")
    print(f"{n_ok}/{len(results)} pass")
    spark.stop()


if __name__ == "__main__":
    main()
