"""eICU pre-MEDS wrangling, Spark edition.

Port of reference eICU_Example/pre_MEDS.py. eICU stores no absolute
timestamps — only per-stay minute offsets plus a discharge year and
24-hour wall-clock strings — so the pre-MEDS stage reconstructs
pseudotimes anchored at an arbitrary constant (only RELATIVE times are
meaningful in eICU, reference pre_MEDS.py:70-76):

- ``hospital_discharge_pseudotime`` = Dec 31 of ``hospitaldischargeyear``
  combined with the ``hospitaldischargetime24`` wall clock;
- every other time = that anchor shifted by the stored minute offsets
  (reference pre_MEDS.py:80-93);
- pseudo date-of-birth = unit admission minus (age·365.25 − 365.25/2)
  days, with the censored ``"> 89"`` age mapped to 90
  (reference pre_MEDS.py:95-101);
- ``check_timestamps_agree`` validates that reconstructed times match the
  stated 24-hour wall clocks within one minute (reference :43-67);
- per-event tables join the patient table's ``unitadmittimestamp`` and
  shift by their own offset column — driven by the SAME
  ``table_preprocessors.yaml`` shape the reference ships
  (reference :161-215, eICU_Example/configs/table_preprocessors.yaml).

Spark mapping: the patient table is metadata-scale next to the big event
tables (vitalPeriodic is ~750× larger), so every pseudotime join
broadcasts the (unit-stay, timestamp) slice — fact tables never shuffle.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from meds_polars_functions_spark.functions.expr import epoch_micros, epoch_seconds

HEALTH_SYSTEM_STAY_ID = "patienthealthsystemstayid"
UNIT_STAY_ID = "patientunitstayid"
PATIENT_ID = "uniquepid"

US_PER_MINUTE = 60_000_000
US_PER_DAY = 86_400_000_000


def _shift_minutes(ts: Column, minutes: Column) -> Column:
    """timestamp + minutes·60s, exact µs arithmetic (NTZ-safe)."""
    return F.timestamp_micros(
        epoch_micros(ts) + minutes.cast("long") * F.lit(US_PER_MINUTE)
    )


def _combine_date_time(ts: Column, time24: Column) -> Column:
    """Polars ``dt.combine``: the DATE of ``ts`` with the wall clock of the
    ``HH:MM:SS`` string ``time24``."""
    return F.to_timestamp(
        F.concat(F.date_format(ts, "yyyy-MM-dd"), F.lit(" "), time24),
        "yyyy-MM-dd HH:mm:ss",
    )


def check_timestamps_agree(df: DataFrame, pseudotime: Column, given_24htime_col: str) -> None:
    """Raise ValueError unless the wall-clock part of ``pseudotime`` matches
    the stated 24h string within one minute (reference pre_MEDS.py:43-67)."""
    delta_min = F.abs(
        epoch_seconds(pseudotime)
        - epoch_seconds(_combine_date_time(pseudotime, F.col(given_24htime_col)))
    ) / F.lit(60.0)
    max_delta = df.select(F.max(delta_min).alias("m")).first()["m"]
    if max_delta is not None and max_delta > 1:
        raise ValueError(
            f"Max minutes between pseudotime and {given_24htime_col} is "
            f"{max_delta}. Should be <= 1."
        )


def process_patient(patient: DataFrame, hospital: DataFrame, validate: bool = True) -> DataFrame:
    """patient + hospital -> typed static/stay table with reconstructed
    pseudotimes (reference pre_MEDS.py:70-159)."""
    hospital_discharge = F.to_timestamp(
        F.concat(
            F.col("hospitaldischargeyear").cast("string"),
            F.lit("-12-31 "),
            F.col("hospitaldischargetime24"),
        ),
        "yyyy-MM-dd HH:mm:ss",
    )
    unit_admit = _shift_minutes(hospital_discharge, -F.col("hospitaldischargeoffset"))
    unit_discharge = _shift_minutes(unit_admit, F.col("unitdischargeoffset"))
    hospital_admit = _shift_minutes(unit_admit, F.col("hospitaladmitoffset"))

    age_years = (
        F.when(F.col("age") == "> 89", F.lit(90.0))
        .otherwise(F.col("age").cast("double"))
    )
    # born at the midpoint of the birth year (reference pre_MEDS.py:99-101)
    dob = F.timestamp_micros(
        epoch_micros(unit_admit)
        - ((age_years * F.lit(365.25) - F.lit(365.25 / 2)) * F.lit(float(US_PER_DAY)))
        .cast("long")
    )

    if validate:
        check_timestamps_agree(patient, hospital_discharge, "hospitaldischargetime24")
        check_timestamps_agree(patient, hospital_admit, "hospitaladmittime24")
        check_timestamps_agree(patient, unit_admit, "unitadmittime24")
        check_timestamps_agree(patient, unit_discharge, "unitdischargetime24")

    return patient.join(F.broadcast(hospital), on="hospitalid", how="left").select(
        PATIENT_ID,
        "gender",
        dob.alias("dateofbirth"),
        "ethnicity",
        HEALTH_SYSTEM_STAY_ID,
        "hospitalid",
        F.col("numbedscategory").alias("hospitalnumbedscategory"),
        F.col("teachingstatus").alias("hospitalteachingstatus"),
        F.col("region").alias("hospitalregion"),
        hospital_admit.alias("hospitaladmittimestamp"),
        "hospitaladmitsource",
        hospital_discharge.alias("hospitaldischargetimestamp"),
        "hospitaldischargelocation",
        "hospitaldischargestatus",
        UNIT_STAY_ID,
        "wardid",
        unit_admit.alias("unitadmittimestamp"),
        "unitadmitsource",
        "unitstaytype",
        F.col("admissionheight").alias("unitadmissionheight"),
        F.col("admissionweight").alias("unitadmissionweight"),
        unit_discharge.alias("unitdischargetimestamp"),
        "unitdischargelocation",
        "unitdischargestatus",
        F.col("dischargeweight").alias("unitdischargeweight"),
    )


def join_and_get_pseudotime_fntr(
    table_name: str,
    offset_col: str | list[str],
    pseudotime_col: str | list[str],
    output_data_cols: list[str] | None = None,
    warning_items: list[str] | None = None,
):
    """Factory matching the reference's table_preprocessors.yaml contract
    (reference pre_MEDS.py:161-215): returns ``fn(df, patient_df)`` that
    inner-joins the patient pseudotime anchor on the unit stay id and adds
    one pseudotime per offset column."""
    offset_cols = [offset_col] if isinstance(offset_col, str) else list(offset_col)
    pseudotime_cols = (
        [pseudotime_col] if isinstance(pseudotime_col, str) else list(pseudotime_col)
    )
    if len(offset_cols) != len(pseudotime_cols):
        raise ValueError(
            "There must be the same number of `offset_col`s and "
            f"`pseudotime_col`s specified. Got {len(offset_cols)} and "
            f"{len(pseudotime_cols)}, respectively."
        )
    out_cols = list(output_data_cols or [])

    def fn(df: DataFrame, patient_df: DataFrame) -> DataFrame:
        anchor = patient_df.select(
            HEALTH_SYSTEM_STAY_ID, UNIT_STAY_ID, "unitadmittimestamp"
        )
        joined = df.join(F.broadcast(anchor), on=UNIT_STAY_ID, how="inner")
        pseudotimes = [
            _shift_minutes(F.col("unitadmittimestamp"), F.col(off)).alias(name)
            for name, off in zip(pseudotime_cols, offset_cols)
        ]
        return joined.select(
            HEALTH_SYSTEM_STAY_ID, UNIT_STAY_ID, *pseudotimes, *out_cols
        )

    return fn


def run_pre_meds(
    spark: SparkSession,
    raw_dir: str,
    output_dir: str,
    preprocessor_cfg: dict | None = None,
    validate: bool = True,
) -> dict[str, str]:
    """patient+hospital -> patient.parquet; each configured event table ->
    pseudotimed parquet. ``preprocessor_cfg`` takes the reference's
    table_preprocessors.yaml content verbatim."""
    from meds_polars_functions_spark.sources.readers import read_table
    from meds_polars_functions_spark.sources.writers import write_parquet

    patient_raw = read_table(spark, os.path.join(raw_dir, "patient"))
    hospital = read_table(spark, os.path.join(raw_dir, "hospital"))
    patient = process_patient(patient_raw, hospital, validate=validate)

    outputs: dict[str, str] = {}
    out = os.path.join(output_dir, "patient.parquet")
    write_parquet(patient, out)
    outputs["patient"] = out
    # re-read: downstream joins reuse the materialized (small) table
    patient = spark.read.parquet(out)

    for table_name, cfg in (preprocessor_cfg or {}).items():
        path = os.path.join(raw_dir, table_name.lower())
        try:
            df = read_table(spark, path)
        except FileNotFoundError:
            continue
        fn = join_and_get_pseudotime_fntr(
            table_name,
            cfg["offset_col"],
            cfg["pseudotime_col"],
            cfg.get("output_data_cols"),
            cfg.get("warning_items"),
        )
        t_out = os.path.join(output_dir, f"{table_name}.parquet")
        write_parquet(fn(df, patient), t_out)
        outputs[table_name] = t_out
    return outputs


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument(
        "--table-preprocessors",
        default=None,
        help="YAML in the reference's table_preprocessors.yaml shape",
    )
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    import yaml

    from meds_polars_functions_spark.session import get_spark

    cfg = None
    if args.table_preprocessors:
        with open(args.table_preprocessors) as f:
            cfg = yaml.safe_load(f)

    spark = get_spark("eicu_pre_meds", master=args.master)
    outputs = run_pre_meds(spark, args.raw_dir, args.output_dir, cfg)
    for name, path in sorted(outputs.items()):
        print(f"{name} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
