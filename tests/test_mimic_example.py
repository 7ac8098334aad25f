"""End-to-end MIMIC-IV example: raw hosp CSVs -> pre-MEDS fixups
(examples/mimic_iv/pre_meds.py) -> extract CLI -> MEDS cohort layout.

Mirrors the reference's MIMIC-IV_Example flow (pre_MEDS.py:18-52 +
configs/event_configs.yaml) on a synthetic 4-patient raw dataset, driven
through subprocesses exactly like a user would run it."""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile

import duckdb
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADMISSIONS_CSV = """subject_id,hadm_id,admittime,dischtime,deathtime,edregtime,edouttime,admission_type,admission_location,discharge_location,insurance,language,marital_status,race
1,101,2010-01-01 10:00:00,2010-01-05 14:30:00,,2010-01-01 08:15:00,2010-01-01 09:45:00,EW EMER.,EMERGENCY ROOM,HOME,Medicare,ENGLISH,MARRIED,WHITE
1,102,2011-03-02 11:00:00,2011-03-06 16:00:00,2011-03-06 15:55:00,,,URGENT,TRANSFER FROM HOSPITAL,DIED,Medicare,ENGLISH,MARRIED,WHITE
2,201,2012-05-10 09:30:00,2012-05-12 12:00:00,,2012-05-10 07:00:00,2012-05-10 09:00:00,EW EMER.,EMERGENCY ROOM,HOME,Medicaid,SPANISH,SINGLE,HISPANIC
3,301,2013-07-20 13:00:00,2013-07-25 10:00:00,,,,ELECTIVE,PHYSICIAN REFERRAL,HOME,Private,ENGLISH,DIVORCED,BLACK
"""

PATIENTS_CSV = """subject_id,gender,anchor_age,anchor_year,dod
1,M,70,2010,
2,F,50,2012,2015-08-01
3,M,30,2013,
4,F,40,2014,
"""

DIAGNOSES_CSV = """subject_id,hadm_id,seq_num,icd_code,icd_version
1,101,1,4019,9
1,102,1,I10,10
2,201,1,E119,10
3,301,1,Z5111,10
"""

DRGCODES_CSV = """subject_id,hadm_id,drg_type,drg_code,description,drg_severity,drg_mortality
1,101,HCFA,194,SIMPLE PNEUMONIA,2,1
2,201,APR,420,DIABETES,1,1
"""


@pytest.fixture(scope="module")
def cohort_dir():
    work = tempfile.mkdtemp(prefix="mimic_example_")
    raw = os.path.join(work, "raw", "hosp")
    os.makedirs(raw)
    for name, content in [
        ("admissions.csv", ADMISSIONS_CSV),
        ("patients.csv", PATIENTS_CSV),
        ("diagnoses_icd.csv", DIAGNOSES_CSV),
        ("drgcodes.csv", DRGCODES_CSV),
    ]:
        with open(os.path.join(raw, name), "w") as f:
            f.write(content)

    pre_meds_dir = os.path.join(work, "pre_meds")
    out = os.path.join(work, "cohort")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}

    r1 = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "mimic_iv", "pre_meds.py"),
            "--raw-dir", os.path.join(work, "raw"),
            "--output-dir", pre_meds_dir,
            "--master", "local[4]",
        ],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert r1.returncode == 0, r1.stderr[-4000:]

    r2 = subprocess.run(
        [
            sys.executable, "-m", "meds_polars_functions_spark.plans.extract_cli",
            "--event-config", os.path.join(REPO, "examples", "mimic_iv", "event_configs.yaml"),
            "--table", f"admissions={os.path.join(work, 'raw', 'hosp', 'admissions.csv')}",
            "--table", f"patients={os.path.join(pre_meds_dir, 'hosp', 'patients.parquet')}",
            "--table", f"diagnoses_icd={os.path.join(pre_meds_dir, 'hosp', 'diagnoses_icd.parquet')}",
            "--table", f"drgcodes={os.path.join(pre_meds_dir, 'hosp', 'drgcodes.parquet')}",
            "--output", out,
            "--master", "local[4]",
        ],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert r2.returncode == 0, r2.stderr[-4000:]
    yield out
    shutil.rmtree(work, ignore_errors=True)


def _events(cohort_dir):
    files = glob.glob(os.path.join(cohort_dir, "data", "split=*", "*.parquet"))
    assert files, "no data shards written"
    return duckdb.sql(
        f"SELECT * FROM read_parquet({[f for f in files]!r})"
    ).fetchdf()


def test_cohort_layout(cohort_dir):
    assert glob.glob(os.path.join(cohort_dir, "data", "split=*"))
    assert glob.glob(os.path.join(cohort_dir, "metadata", "patient_splits", "*.parquet"))
    assert glob.glob(os.path.join(cohort_dir, "metadata", "codes", "*.parquet"))
    assert os.path.exists(os.path.join(cohort_dir, "metadata", "splits.json"))
    assert os.path.exists(os.path.join(cohort_dir, "extract_summary.json"))


def test_death_coalesce_and_birth_year(cohort_dir):
    ev = _events(cohort_dir)
    deaths = ev[ev.code == "MEDS_DEATH"].set_index("patient_id")["time"]
    # patient 1: in-hospital deathtime (min across admissions) wins
    assert str(deaths.loc[1]) == "2011-03-06 15:55:00"
    # patient 2: registry dod (date-only format) is the fallback
    assert str(deaths.loc[2]) == "2015-08-01 00:00:00"
    # patients 3/4: alive -> no MEDS_DEATH row
    assert set(deaths.index) == {1, 2}

    births = ev[ev.code == "MEDS_BIRTH"].set_index("patient_id")["time"]
    # year_of_birth = anchor_year - anchor_age, parsed with %Y
    assert str(births.loc[1]) == "1940-01-01 00:00:00"
    assert str(births.loc[4]) == "1974-01-01 00:00:00"


def test_diagnoses_inherit_discharge_time(cohort_dir):
    ev = _events(cohort_dir)
    dx = ev[ev.code == "DIAGNOSIS//ICD//9//4019"]
    assert len(dx) == 1
    # discharge time of hadm 101
    assert str(dx.iloc[0]["time"]) == "2010-01-05 14:30:00"
    drg = ev[ev.code.str.startswith("DRG//HCFA//194")]
    assert len(drg) == 1 and str(drg.iloc[0]["time"]) == "2010-01-05 14:30:00"


def test_static_gender_rows(cohort_dir):
    ev = _events(cohort_dir)
    gender = ev[ev.code.str.startswith("GENDER//")]
    assert set(gender.patient_id) == {1, 2, 3, 4}
    assert gender["time"].isna().all()


def test_all_patients_split(cohort_dir):
    import json

    with open(os.path.join(cohort_dir, "extract_summary.json")) as f:
        summary = json.load(f)
    assert summary["patients"] == 4
    assert sum(summary["shards"].values()) >= 1
