"""End-to-end extraction pipeline test, modeled on the reference's
tests/test_extract.py golden flow: raw subjects + admit_vitals CSVs ->
event conversion -> patient split -> merge/sort -> code metadata."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.aggregate_code_metadata import (
    aggregate_code_metadata,
)
from meds_polars_functions_spark.operators.extract_events import convert_to_events
from meds_polars_functions_spark.operators.merge_sort import merge_and_sort
from meds_polars_functions_spark.operators.split_patients import (
    harvest_patient_ids,
    shard_patients,
    splits_to_dataframe,
    filter_to_split,
)
from meds_polars_functions_spark.schema import finalize_data

SUBJECTS = [
    (239684, "12/28/1980", "BROWN", 175.271),
    (1195293, "06/20/1978", "BLUE", 164.687),
    (68729, "03/09/1978", "HAZEL", 160.395),
    (814703, "03/28/1976", "HAZEL", 156.486),
]

ADMIT_VITALS = [
    (239684, "05/11/2010, 17:41:51", "05/11/2010, 19:27:19", "CARDIAC", "05/11/2010, 17:41:51", 102.6, 96.0),
    (239684, "05/11/2010, 17:41:51", "05/11/2010, 19:27:19", "CARDIAC", "05/11/2010, 17:48:48", 105.1, 96.2),
    (1195293, "06/20/2010, 19:23:52", "06/20/2010, 20:50:04", "CARDIAC", "06/20/2010, 19:23:52", 109.0, 100.0),
    (68729, "05/26/2010, 02:30:56", "05/26/2010, 04:51:52", "PULMONARY", "05/26/2010, 02:30:56", 86.0, 97.8),
    (814703, "02/05/2010, 05:55:39", "02/05/2010, 07:02:30", "ORTHOPEDIC", "02/05/2010, 05:55:39", 170.2, 100.1),
]

SUBJECTS_EVENT_CFG = {
    "eye_color": {
        "code": ["EYE_COLOR", "col(eye_color)"],
        "time": None,
    },
    "height": {
        "code": "HEIGHT",
        "time": None,
        "numeric_value": "col(height)",
    },
    "dob": {
        "code": "DOB",
        "time": "col(dob)",
        "time_format": "%m/%d/%Y",
    },
}

VITALS_EVENT_CFG = {
    "admissions": {
        "code": ["ADMISSION", "col(department)"],
        "time": "col(admit_date)",
        "time_format": "%m/%d/%Y, %H:%M:%S",
    },
    "discharge": {
        "code": "DISCHARGE",
        "time": "col(disch_date)",
        "time_format": "%m/%d/%Y, %H:%M:%S",
    },
    "HR": {
        "code": "HR",
        "time": "col(vitals_date)",
        "time_format": "%m/%d/%Y, %H:%M:%S",
        "numeric_value": "col(HR)",
    },
    "temp": {
        "code": "TEMP",
        "time": "col(vitals_date)",
        "time_format": "%m/%d/%Y, %H:%M:%S",
        "numeric_value": "col(temp)",
    },
}


@pytest.fixture(scope="module")
def extracted(spark):
    subjects = spark.createDataFrame(
        SUBJECTS, "MRN long, dob string, eye_color string, height double"
    )
    vitals = spark.createDataFrame(
        ADMIT_VITALS,
        "patient_id long, admit_date string, disch_date string, "
        "department string, vitals_date string, HR double, temp double",
    )
    ev1 = convert_to_events(subjects, SUBJECTS_EVENT_CFG, patient_id_col="MRN")
    ev2 = convert_to_events(vitals, VITALS_EVENT_CFG)
    merged = merge_and_sort([ev1, ev2])
    return finalize_data(merged)


def test_e2e_schema(extracted):
    assert [f.name for f in extracted.schema.fields[:4]] == [
        "patient_id", "time", "code", "numeric_value",
    ]
    dtypes = dict(extracted.dtypes)
    assert dtypes["patient_id"] == "bigint"
    assert dtypes["time"] == "timestamp"
    assert dtypes["numeric_value"] == "float"


def test_e2e_events(extracted):
    rows = extracted.collect()
    p = [r for r in rows if r["patient_id"] == 239684]
    codes = [r["code"] for r in p]
    assert "EYE_COLOR//BROWN" in codes
    assert "ADMISSION//CARDIAC" in codes
    assert codes.count("HR") == 2
    # static rows have null time; DOB parsed from %m/%d/%Y
    dob = [r for r in p if r["code"] == "DOB"][0]
    assert dob["time"] == dt.datetime(1980, 12, 28)
    hr = sorted(r["numeric_value"] for r in p if r["code"] == "HR")
    assert hr == pytest.approx([102.6, 105.1], abs=1e-4)


def test_e2e_sorted_within_patient(extracted):
    # canonical MEDS invariant: per partition, rows sorted by
    # (patient_id, time nulls first)
    def check(it):
        prev = None
        for row in it:
            key = (row.patient_id, row.time is not None, row.time or dt.datetime.min)
            if prev is not None:
                assert key >= prev, (prev, key)
            prev = key
        return iter(())

    list(extracted.rdd.mapPartitions(check).collect())


def test_e2e_split_and_metadata(spark, extracted):
    ids = harvest_patient_ids([extracted])
    assert ids == [68729, 239684, 814703, 1195293]
    shards = shard_patients(
        ids,
        n_patients_per_shard=2,
        split_fracs_dict={"train": 0.5, "tuning": 0.25, "held_out": 0.25},
        seed=1,
    )
    all_ids = sorted(pid for v in shards.values() for pid in v)
    assert all_ids == ids
    splits_df = splits_to_dataframe(spark, shards)
    train = filter_to_split(extracted, splits_df, "train")
    n_train_patients = train.select("patient_id").distinct().count()
    assert n_train_patients == 2

    meta = aggregate_code_metadata(extracted)
    hr = [r for r in meta.collect() if r["code"] == "HR"][0]
    assert hr["code/n_occurrences"] == 5
    assert hr["code/n_patients"] == 4
    assert math.isclose(
        hr["values/sum"], 102.6 + 105.1 + 109.0 + 86.0 + 170.2, rel_tol=1e-5
    )
