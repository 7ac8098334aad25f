"""eICU pre-MEDS example (examples/eicu/pre_meds.py): pseudotime
reconstruction from minute offsets, 24h-clock validation, and the
table-preprocessor factory — on a synthetic 2-patient raw extract.

Wall-clock consistency (precomputed for the fixture rows):
  p1: discharge anchor 2015-12-31 18:30; unit admit = −2000 min =
      2015-12-30 09:10; unit discharge = +1500 min = 2015-12-31 10:10;
      hospital admit = −300 min = 2015-12-30 04:10.
  p2: discharge anchor 2016-12-31 02:00; unit admit = −3000 min =
      2016-12-29 00:00; unit discharge = +2800 min = 2016-12-30 22:40;
      hospital admit = −100 min = 2016-12-28 22:20.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from examples.eicu.pre_meds import (
    join_and_get_pseudotime_fntr,
    process_patient,
    run_pre_meds,
)

PATIENT_SCHEMA = (
    "uniquepid string, gender string, age string, ethnicity string, "
    "patienthealthsystemstayid long, patientunitstayid long, hospitalid long, "
    "wardid long, hospitaldischargeyear int, hospitaldischargetime24 string, "
    "hospitaldischargeoffset int, unitdischargeoffset int, hospitaladmitoffset int, "
    "hospitaladmittime24 string, unitadmittime24 string, unitdischargetime24 string, "
    "hospitaladmitsource string, hospitaldischargelocation string, "
    "hospitaldischargestatus string, unitadmitsource string, unitstaytype string, "
    "admissionheight double, admissionweight double, unitdischargelocation string, "
    "unitdischargestatus string, dischargeweight double"
)

PATIENT_ROWS = [
    ("p1", "Female", "52", "Caucasian", 10, 100, 5, 1, 2015, "18:30:00",
     2000, 1500, -300, "04:10:00", "09:10:00", "10:10:00",
     "Emergency Department", "Home", "Alive", "admit", "stay",
     170.0, 80.0, "Home", "Alive", 79.5),
    ("p2", "Male", "> 89", "African American", 20, 200, 5, 2, 2016, "02:00:00",
     3000, 2800, -100, "22:20:00", "00:00:00", "22:40:00",
     "Direct Admit", "Home", "Alive", "admit", "stay",
     160.0, 70.0, "Home", "Alive", 69.0),
]


@pytest.fixture(scope="module")
def frames(spark):
    patient = spark.createDataFrame(PATIENT_ROWS, PATIENT_SCHEMA)
    hospital = spark.createDataFrame(
        [(5, ">500", "t", "Midwest")],
        "hospitalid long, numbedscategory string, teachingstatus string, region string",
    )
    return patient, hospital


def test_pseudotime_reconstruction(frames):
    patient, hospital = frames
    out = {r["uniquepid"]: r for r in process_patient(patient, hospital).collect()}
    p1 = out["p1"]
    assert p1["hospitaldischargetimestamp"] == dt.datetime(2015, 12, 31, 18, 30)
    assert p1["unitadmittimestamp"] == dt.datetime(2015, 12, 30, 9, 10)
    assert p1["unitdischargetimestamp"] == dt.datetime(2015, 12, 31, 10, 10)
    assert p1["hospitaladmittimestamp"] == dt.datetime(2015, 12, 30, 4, 10)
    # age "> 89" -> 90 years before unit admit (mid-year birth assumption)
    p2 = out["p2"]
    assert p2["unitadmittimestamp"] == dt.datetime(2016, 12, 29, 0, 0)
    expect_days = 90 * 365.25 - 365.25 / 2
    got = (p2["unitadmittimestamp"] - p2["dateofbirth"]).total_seconds() / 86400
    assert abs(got - expect_days) < 0.01
    # hospital enrichment joined (broadcast left join)
    assert p1["hospitalregion"] == "Midwest"
    assert p1["hospitalnumbedscategory"] == ">500"


def test_wallclock_validation_catches_lies(frames):
    from pyspark.sql import functions as F

    patient, hospital = frames
    bad = patient.withColumn("unitadmittime24", F.lit("12:00:00"))
    with pytest.raises(ValueError, match="Should be <= 1"):
        process_patient(bad, hospital)


def test_event_table_factory(frames, spark):
    patient, hospital = frames
    processed = process_patient(patient, hospital)
    lab = spark.createDataFrame(
        [(100, 60, "potassium", 4.1, "mmol/L"), (200, -15, "sodium", 140.0, "mmol/L")],
        "patientunitstayid long, labresultoffset int, labname string, "
        "labresult double, labmeasurenamesystem string",
    )
    fn = join_and_get_pseudotime_fntr(
        "lab", "labresultoffset", "labResultDrawnTimestamp",
        ["labname", "labresult", "labmeasurenamesystem"],
    )
    rows = {r["labname"]: r for r in fn(lab, processed).collect()}
    ua = {r["uniquepid"]: r["unitadmittimestamp"] for r in processed.collect()}
    assert rows["potassium"]["labResultDrawnTimestamp"] == ua["p1"] + dt.timedelta(minutes=60)
    assert rows["sodium"]["labResultDrawnTimestamp"] == ua["p2"] - dt.timedelta(minutes=15)
    assert rows["potassium"]["patienthealthsystemstayid"] == 10


def test_mismatched_offset_pseudotime_lists_rejected():
    with pytest.raises(ValueError, match="same number"):
        join_and_get_pseudotime_fntr("t", ["a", "b"], ["onlyone"])


def test_run_pre_meds_end_to_end(frames, spark, tmp_path):
    import yaml

    patient, hospital = frames
    raw = tmp_path / "raw"
    raw.mkdir()
    patient.write.parquet(str(raw / "patient.parquet"))
    hospital.write.parquet(str(raw / "hospital.parquet"))
    spark.createDataFrame(
        [(100, 60, "potassium", 4.1, "mmol/L")],
        "patientunitstayid long, labresultoffset int, labname string, "
        "labresult double, labmeasurenamesystem string",
    ).write.parquet(str(raw / "lab.parquet"))

    with open(os.path.join("examples", "eicu", "table_preprocessors.yaml")) as f:
        cfg = yaml.safe_load(f)
    outputs = run_pre_meds(spark, str(raw), str(tmp_path / "out"), cfg)
    assert set(outputs) == {"patient", "lab"}  # vitalPeriodic/diagnosis absent -> skipped
    lab = spark.read.parquet(outputs["lab"]).collect()
    assert len(lab) == 1 and lab[0]["labname"] == "potassium"
    pat = spark.read.parquet(outputs["patient"])
    assert "unitadmittimestamp" in pat.columns


@pytest.mark.slow
def test_eicu_extract_cli_end_to_end(frames, spark, tmp_path):
    """pre-MEDS outputs -> extract CLI with examples/eicu/event_configs.yaml
    -> MEDS cohort: static + timed events keyed by the health-system stay."""
    import glob
    import subprocess
    import sys as _sys

    import duckdb
    import yaml

    patient, hospital = frames
    raw = tmp_path / "raw2"
    raw.mkdir()
    patient.write.parquet(str(raw / "patient.parquet"))
    hospital.write.parquet(str(raw / "hospital.parquet"))
    spark.createDataFrame(
        [(100, 60, "potassium", 4.1, "chemistry"), (200, -15, "sodium", 140.0, "chemistry")],
        "patientunitstayid long, labresultoffset int, labname string, "
        "labresult double, labmeasurenamesystem string",
    ).write.parquet(str(raw / "lab.parquet"))

    with open(os.path.join("examples", "eicu", "table_preprocessors.yaml")) as f:
        cfg = yaml.safe_load(f)
    pre = run_pre_meds(spark, str(raw), str(tmp_path / "pre2"), cfg)

    out = str(tmp_path / "cohort2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            _sys.executable, "-m", "meds_polars_functions_spark.plans.extract_cli",
            "--event-config", os.path.join(repo, "examples", "eicu", "event_configs.yaml"),
            "--table", f"patient={pre['patient']}",
            "--table", f"lab={pre['lab']}",
            "--output", out,
            "--master", "local[4]",
        ],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-4000:]
    files = glob.glob(os.path.join(out, "data", "split=*", "*.parquet"))
    ev = duckdb.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    # both health-system stays produced events
    assert set(ev.patient_id) == {10, 20}
    # static rows (gender/ethnicity) have null time
    assert ev[ev.code.str.startswith("GENDER//")]["time"].isna().all()
    # the lab event carries its pseudotime and numeric value
    lab_rows = ev[ev.code == "LAB//chemistry//potassium"]
    # numeric_value is float32 in the finalized MEDS schema
    assert len(lab_rows) == 1 and abs(lab_rows.iloc[0]["numeric_value"] - 4.1) < 1e-6
    # unit admission weight became a numeric measurement
    assert (ev.code == "UNIT_ADMISSION_WEIGHT").sum() == 2
