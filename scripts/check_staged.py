"""Registration-grade pre-check for STAGED queries: the strict value
compare + dtype-parity scan every staging must pass at three scale
factors on a DEFAULT ANSI session (the driver's session shape) before
it may take a window slot (COVERAGE.md standing rule; this script
consolidates the inline per-round heredocs used through round 13).

Usage: python scripts/check_staged.py [name ...]
  No names = every entry in __spark_entry__.staged_queries().
  Explicit names may also resolve from the FULL registry (round 14:
  lets a registration commit re-run the exact three-SF pre-check on
  just-registered rows, and lets build-and-register-in-one-round rows
  like the streaming twins pre-check before taking their slot).
  SFs checked: 0.001, 0.01, 0.1 (override with CHECK_STAGED_SFS, a
  comma list like "0.001,0.01").

Exit code 0 iff every (query, sf) PASSes values AND dtypes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as em
from scripts.compare_oracle import TABLES, _normalize


def main() -> None:
    from pyspark.sql import SparkSession

    names = sys.argv[1:] or sorted(em.staged_queries())
    sfs = os.environ.get("CHECK_STAGED_SFS", "0.001,0.01,0.1").split(",")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("check_staged")
        .getOrCreate()
    )
    staged = {**em._registry(), **em.staged_queries()}
    oracles = {**em.oracle_sql(), **em.staged_oracle_sql()}
    n_fail = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf.strip()}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            if name not in staged:
                print(f"FAIL {sf} {name}: not staged and not registered")
                n_fail += 1
                continue
            if name not in oracles:
                print(f"FAIL {sf} {name}: no oracle (verifies nothing)")
                n_fail += 1
                continue
            try:
                sdf = staged[name](spark, sf_dir).toPandas()
                odf = con.execute(oracles[name]).fetchdf()
            except Exception as exc:  # noqa: BLE001 - report, keep scanning
                print(f"FAIL {sf} {name}: {type(exc).__name__}: {exc}")
                n_fail += 1
                continue
            scols, srows = _normalize(sdf)
            ocols, orows = _normalize(odf)
            values = scols == ocols and srows == orows and len(srows) > 0

            # datetime64 RESOLUTION (Spark toPandas ns vs DuckDB fetchdf
            # us) is a pandas transport artifact, not a dtype class —
            # same collapse as tests/test_staged_queries._dtype_key
            # (sessionize precedent: raw-timestamp outputs are
            # driver-green; the comparator isoformats values).
            def _k(t):
                s = str(t)
                return "datetime64" if s.startswith("datetime64") else s

            dtypes = [_k(t) for t in sdf[sorted(sdf.columns)].dtypes] == [
                _k(t) for t in odf[sorted(odf.columns)].dtypes
            ]
            flag = "PASS" if (values and dtypes) else "FAIL"
            n_fail += flag == "FAIL"
            print(
                f"{flag} {sf} {name}: rows={len(srows)} "
                f"values={'ok' if values else 'MISMATCH'} "
                f"dtypes={'ok' if dtypes else 'MISMATCH'}"
            )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
