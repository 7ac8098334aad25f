"""MIMIC-IV pre-MEDS wrangling, Spark edition.

Port of reference MIMIC-IV_Example/pre_MEDS.py:18-52 — the three raw-table
fixups MIMIC needs before generic event extraction:

- ``hosp/diagnoses_icd`` and ``hosp/drgcodes`` carry no usable timestamp of
  their own; each row inherits its admission's discharge time via an
  ``hadm_id`` join (reference pre_MEDS.py:18-24).
- ``hosp/patients`` static data gets a best-effort death time
  (``coalesce(min admission deathtime, dod)``) and the derived birth year
  ``anchor_year - anchor_age`` (reference pre_MEDS.py:27-45).

Spark mapping: the admissions slice used for enrichment is metadata-scale
relative to the event tables, so both joins are broadcast-hash — the big
diagnosis/DRG fact tables never shuffle. Tables that need no fixup are
passed through untouched (the reference symlinks; here the caller simply
points the extract CLI at the raw file, so no copy is made at all).

Usage (after which ``plans.extract_cli`` consumes the outputs together
with ``examples/mimic_iv/event_configs.yaml``):

    python examples/mimic_iv/pre_meds.py --raw-dir RAW --output-dir OUT
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as a bare script from anywhere: the engine package lives two
# directories up from this example
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables rewritten by this stage -> the admissions columns they need.
#: Mirrors reference pre_MEDS.py:48-52 FUNCTIONS.
PROCESSED_TABLES = ("hosp/diagnoses_icd", "hosp/drgcodes", "hosp/patients")


def add_discharge_time_by_hadm_id(
    df: DataFrame,
    admissions: DataFrame,
    out_column_name: str = "hadm_discharge_time",
) -> DataFrame:
    """Attach the admission's discharge time to every row, keyed by
    ``hadm_id`` (reference pre_MEDS.py:18-24). Broadcast left join: the
    (hadm_id, dischtime) projection is tiny next to the event table."""
    slim = admissions.select(
        "hadm_id", F.col("dischtime").alias(out_column_name)
    ).dropDuplicates(["hadm_id"])
    return df.join(F.broadcast(slim), on="hadm_id", how="left")


def fix_static_data(patients: DataFrame, admissions: DataFrame) -> DataFrame:
    """Static-table fixups (reference pre_MEDS.py:27-45):

    - death time = earliest in-hospital ``deathtime`` if any admission has
      one, else the registry ``dod``;
    - ``year_of_birth`` = ``anchor_year - anchor_age`` as a string (parsed
      downstream with the ``%Y`` time format, like the reference).
    """
    death_times = admissions.groupBy("subject_id").agg(
        F.min("deathtime").alias("deathtime")
    )
    return patients.join(F.broadcast(death_times), on="subject_id", how="left").select(
        "subject_id",
        F.coalesce(F.col("deathtime"), F.col("dod")).alias("dod"),
        (F.col("anchor_year") - F.col("anchor_age")).cast("string").alias("year_of_birth"),
        "gender",
    )


def run_pre_meds(spark: SparkSession, raw_dir: str, output_dir: str) -> dict[str, str]:
    """Run the pre-MEDS stage: returns {table prefix -> output parquet dir}
    for the processed tables. Unprocessed raw tables are intentionally NOT
    copied — feed their raw paths straight to the extract CLI."""
    from meds_polars_functions_spark.sources.readers import read_table
    from meds_polars_functions_spark.sources.writers import write_parquet

    admissions = read_table(spark, os.path.join(raw_dir, "hosp/admissions"))

    outputs: dict[str, str] = {}

    def _write(prefix: str, df: DataFrame) -> None:
        out = os.path.join(output_dir, f"{prefix}.parquet")
        write_parquet(df, out)
        outputs[prefix] = out

    for prefix in ("hosp/diagnoses_icd", "hosp/drgcodes"):
        path = os.path.join(raw_dir, prefix)
        try:
            df = read_table(spark, path)
        except FileNotFoundError:
            continue
        _write(prefix, add_discharge_time_by_hadm_id(df, admissions))

    patients = read_table(spark, os.path.join(raw_dir, "hosp/patients"))
    _write("hosp/patients", fix_static_data(patients, admissions))
    return outputs


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from meds_polars_functions_spark.session import get_spark

    spark = get_spark("mimic_pre_meds", master=args.master)
    outputs = run_pre_meds(spark, args.raw_dir, args.output_dir)
    for prefix, out in sorted(outputs.items()):
        print(f"{prefix} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
