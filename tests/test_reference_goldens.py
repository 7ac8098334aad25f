"""Golden-output parity tests against the reference's OWN per-stage test
fixtures.

Inputs are the canonical 4-shard MEDS cohort from the reference's
tests/transform_tester_base.py:60-189 (MEDS_TRAIN_0/1, MEDS_TUNING_0,
MEDS_HELD_OUT_0, MEDS_CODE_METADATA_CSV); expected outputs are the WANT
frames from its test_filter_patients.py, test_filter_measurements.py,
test_occlude_outliers.py, test_fit_vocabulary_indices.py,
test_normalization.py, test_add_time_derived_measurements.py,
test_reorder_measurements.py and test_tokenization.py. Data is
transcribed verbatim (it defines WHAT to compute); the harness is
Spark-native.

Float comparisons use abs tol 1e-4: the reference's goldens were derived
with float32 code-metadata statistics (sum/sum_sqd stored as Float32,
means/stds computed in float32 — see its test_occlude_outliers.py
NORMALIZED_VALS_CALC_STR), while this engine computes in float64 from the
same float32-rounded inputs; the drift is ~1e-5 worst case here.

Row order: the reference checks row order (check_row_order=True in its
check_df_output). Spark frames are unordered, but every order-sensitive
operator here ends in repartition(patient) + sortWithinPartitions, so the
collected per-patient row sequence IS the operator's order — the
order-sensitive tests compare per-(patient, time) code sequences.
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.add_time_derived_measurements import (
    add_time_derived_measurements,
)
from meds_polars_functions_spark.operators.filter_measurements import (
    filter_measurements,
)
from meds_polars_functions_spark.operators.filter_patients import (
    filter_patients_by_num_events,
)
from meds_polars_functions_spark.operators.fit_vocabulary_indices import (
    fit_vocabulary_indices,
)
from meds_polars_functions_spark.operators.normalization import normalize
from meds_polars_functions_spark.operators.occlude_outliers import occlude_outliers
from meds_polars_functions_spark.operators.reorder_measurements import (
    reorder_measurements,
)
from meds_polars_functions_spark.operators.tokenization import (
    extract_seq_of_patient_events,
    extract_statics_and_schema,
)

TS_FMT = "%m/%d/%Y, %H:%M:%S"

# --- input cohort: reference transform_tester_base.py:70-148 ---------------

MEDS_SHARDS_CSV = {
    "train/0": """
239684,,EYE_COLOR//BROWN,
239684,,HEIGHT,175.271115221764
239684,"12/28/1980, 00:00:00",DOB,
239684,"05/11/2010, 17:41:51",ADMISSION//CARDIAC,
239684,"05/11/2010, 17:41:51",HR,102.6
239684,"05/11/2010, 17:41:51",TEMP,96.0
239684,"05/11/2010, 17:48:48",HR,105.1
239684,"05/11/2010, 17:48:48",TEMP,96.2
239684,"05/11/2010, 18:25:35",HR,113.4
239684,"05/11/2010, 18:25:35",TEMP,95.8
239684,"05/11/2010, 18:57:18",HR,112.6
239684,"05/11/2010, 18:57:18",TEMP,95.5
239684,"05/11/2010, 19:27:19",DISCHARGE,
1195293,,EYE_COLOR//BLUE,
1195293,,HEIGHT,164.6868838269085
1195293,"06/20/1978, 00:00:00",DOB,
1195293,"06/20/2010, 19:23:52",ADMISSION//CARDIAC,
1195293,"06/20/2010, 19:23:52",HR,109.0
1195293,"06/20/2010, 19:23:52",TEMP,100.0
1195293,"06/20/2010, 19:25:32",HR,114.1
1195293,"06/20/2010, 19:25:32",TEMP,100.0
1195293,"06/20/2010, 19:45:19",HR,119.8
1195293,"06/20/2010, 19:45:19",TEMP,99.9
1195293,"06/20/2010, 20:12:31",HR,112.5
1195293,"06/20/2010, 20:12:31",TEMP,99.8
1195293,"06/20/2010, 20:24:44",HR,107.7
1195293,"06/20/2010, 20:24:44",TEMP,100.0
1195293,"06/20/2010, 20:41:33",HR,107.5
1195293,"06/20/2010, 20:41:33",TEMP,100.4
1195293,"06/20/2010, 20:50:04",DISCHARGE,
""",
    "train/1": """
68729,,EYE_COLOR//HAZEL,
68729,,HEIGHT,160.3953106166676
68729,"03/09/1978, 00:00:00",DOB,
68729,"05/26/2010, 02:30:56",ADMISSION//PULMONARY,
68729,"05/26/2010, 02:30:56",HR,86.0
68729,"05/26/2010, 02:30:56",TEMP,97.8
68729,"05/26/2010, 04:51:52",DISCHARGE,
814703,,EYE_COLOR//HAZEL,
814703,,HEIGHT,156.48559093209357
814703,"03/28/1976, 00:00:00",DOB,
814703,"02/05/2010, 05:55:39",ADMISSION//ORTHOPEDIC,
814703,"02/05/2010, 05:55:39",HR,170.2
814703,"02/05/2010, 05:55:39",TEMP,100.1
814703,"02/05/2010, 07:02:30",DISCHARGE,
""",
    "tuning/0": """
754281,,EYE_COLOR//BROWN,
754281,,HEIGHT,166.22261567137025
754281,"12/19/1988, 00:00:00",DOB,
754281,"01/03/2010, 06:27:59",ADMISSION//PULMONARY,
754281,"01/03/2010, 06:27:59",HR,142.0
754281,"01/03/2010, 06:27:59",TEMP,99.8
754281,"01/03/2010, 08:22:13",DISCHARGE,
""",
    "held_out/0": """
1500733,,EYE_COLOR//BROWN,
1500733,,HEIGHT,158.60131573580904
1500733,"07/20/1986, 00:00:00",DOB,
1500733,"06/03/2010, 14:54:38",ADMISSION//ORTHOPEDIC,
1500733,"06/03/2010, 14:54:38",HR,91.4
1500733,"06/03/2010, 14:54:38",TEMP,100.0
1500733,"06/03/2010, 15:39:49",HR,84.4
1500733,"06/03/2010, 15:39:49",TEMP,100.3
1500733,"06/03/2010, 16:20:49",HR,90.1
1500733,"06/03/2010, 16:20:49",TEMP,100.1
1500733,"06/03/2010, 16:44:26",DISCHARGE,
""",
}

# (code, n_occ, n_pat, v_n, v_sum, v_sum_sqd, description, parent_code)
# reference transform_tester_base.py:154-170; sums stored as FLOAT (f32)
MEDS_CODE_METADATA_ROWS = [
    (None, 44, 4, 28, 3198.8389005974336, 382968.28937288234, None, None),
    ("ADMISSION//CARDIAC", 2, 2, 0, None, None, None, None),
    ("ADMISSION//ORTHOPEDIC", 1, 1, 0, None, None, None, None),
    ("ADMISSION//PULMONARY", 1, 1, 0, None, None, None, None),
    ("DISCHARGE", 4, 4, 0, None, None, None, None),
    ("DOB", 4, 4, 0, None, None, None, None),
    ("EYE_COLOR//BLUE", 1, 1, 0, None, None, "Blue Eyes. Less common than brown.", None),
    ("EYE_COLOR//BROWN", 1, 1, 0, None, None, "Brown Eyes. The most common eye color.", None),
    ("EYE_COLOR//HAZEL", 2, 2, 0, None, None, "Hazel eyes. These are uncommon", None),
    ("HEIGHT", 4, 4, 4, 656.8389005974336, 108056.12937288235, None, None),
    ("HR", 12, 4, 12, 1360.5000000000002, 158538.77, "Heart Rate", "LOINC/8867-4"),
    ("TEMP", 12, 4, 12, 1181.4999999999998, 116373.38999999998, "Body Temperature", "LOINC/8310-5"),
]

# reference test_normalization.py:14-27 (explicit vocab indices, no null row)
NORMALIZATION_METADATA_ROWS = [
    ("ADMISSION//CARDIAC", 0, None, None, 1),
    ("ADMISSION//ORTHOPEDIC", 0, None, None, 2),
    ("ADMISSION//PULMONARY", 0, None, None, 3),
    ("DISCHARGE", 0, None, None, 4),
    ("DOB", 0, None, None, 5),
    ("EYE_COLOR//BLUE", 0, None, None, 6),
    ("EYE_COLOR//BROWN", 0, None, None, 7),
    ("EYE_COLOR//HAZEL", 0, None, None, 8),
    ("HEIGHT", 4, 656.8389005974336, 108056.12937288235, 9),
    ("HR", 12, 1360.5000000000002, 158538.77, 10),
    ("TEMP", 12, 1181.4999999999998, 116373.38999999998, 11),
]


def _parse_ts(s: str) -> datetime | None:
    return datetime.strptime(s, TS_FMT) if s else None


def _parse_rows(csv_str: str, extra_bool: bool = False):
    """Parse the inline shard CSVs (no header; quoted timestamps)."""
    import csv as _csv
    from io import StringIO

    rows = []
    for rec in _csv.reader(StringIO(csv_str.strip())):
        if not rec:
            continue
        pid, ts, code, val = rec[:4]
        row = [
            int(pid),
            _parse_ts(ts),
            code if code else None,
            float(val) if val else None,
        ]
        if extra_bool:
            flag = rec[4] if len(rec) > 4 else ""
            row.append({"true": True, "false": False}.get(flag))
        rows.append(tuple(row))
    return rows


@pytest.fixture(scope="module")
def shards(spark):
    return {
        name: spark.createDataFrame(
            _parse_rows(csv),
            "patient_id long, time timestamp, code string, numeric_value double",
        )
        for name, csv in MEDS_SHARDS_CSV.items()
    }


@pytest.fixture(scope="module")
def code_metadata(spark):
    return spark.createDataFrame(
        MEDS_CODE_METADATA_ROWS,
        "code string, `code/n_occurrences` long, `code/n_patients` long, "
        "`values/n_occurrences` long, `values/sum` float, `values/sum_sqd` float, "
        "description string, parent_code string",
    )


@pytest.fixture(scope="module")
def normalization_metadata(spark):
    return spark.createDataFrame(
        NORMALIZATION_METADATA_ROWS,
        "code string, `values/n_occurrences` long, `values/sum` float, "
        "`values/sum_sqd` float, `code/vocab_index` long",
    )


def _key(row):
    return (
        row[0],
        row[1] or datetime.min,
        row[2] or "",
    )


def _assert_same_rows(got, want, tol=1e-4):
    """Multiset equality on (patient_id, time, code, float..., exact...)."""
    got, want = sorted(got, key=_key), sorted(want, key=_key)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for g, w in zip(got, want):
        assert g[:3] == w[:3], f"{g[:3]} != {w[:3]}"
        for gv, wv in zip(g[3:], w[3:]):
            if isinstance(wv, float) and gv is not None:
                assert abs(gv - wv) <= tol, f"{g[:3]}: {gv} != {wv}"
            else:
                assert gv == wv, f"{g[:3]}: {gv} != {wv}"


def _code_seqs(rows):
    """Per-(patient, time) code sequence, in row order."""
    seqs: dict = {}
    for r in rows:
        seqs.setdefault((r[0], r[1]), []).append(r[2])
    return seqs


# --- filter_patients: reference test_filter_patients.py ---------------------


def test_golden_filter_patients(shards):
    """min_events_per_patient=5 keeps 239684, 1195293, 1500733 only; a
    patient's null time counts as one event (Polars n_unique)."""
    kept = {
        "train/0": {239684, 1195293},
        "train/1": set(),
        "tuning/0": set(),
        "held_out/0": {1500733},
    }
    for name, df in shards.items():
        out = filter_patients_by_num_events(df, 5)
        got_rows = out.collect()
        got_pids = {r["patient_id"] for r in got_rows}
        assert got_pids == kept[name], name
        # surviving patients keep every row
        want = [r for r in df.collect() if r["patient_id"] in kept[name]]
        _assert_same_rows([tuple(r) for r in got_rows], [tuple(r) for r in want])


# --- filter_measurements: reference test_filter_measurements.py -------------


def test_golden_filter_measurements(shards, code_metadata):
    """min_patients_per_code=2 drops EYE_COLOR//BROWN, EYE_COLOR//BLUE,
    ADMISSION//ORTHOPEDIC, ADMISSION//PULMONARY."""
    dropped = {
        "EYE_COLOR//BROWN",
        "EYE_COLOR//BLUE",
        "ADMISSION//ORTHOPEDIC",
        "ADMISSION//PULMONARY",
    }
    for name, df in shards.items():
        out = filter_measurements(df, code_metadata, min_patients_per_code=2).select(
            "patient_id", "time", "code", "numeric_value"
        )
        want = [tuple(r) for r in df.collect() if r["code"] not in dropped]
        _assert_same_rows([tuple(r) for r in out.collect()], want)


# --- occlude_outliers: reference test_occlude_outliers.py -------------------

# (pid, ts, code, value_after, is_inlier) for every row whose value changes
# or gains a flag; transcribed from WANT_* in test_occlude_outliers.py
OCCLUDE_FLAGS = {
    # train/0
    (239684, None, "HEIGHT"): (None, False),
    (239684, "05/11/2010, 17:41:51", "HR"): (102.6, True),
    (239684, "05/11/2010, 17:41:51", "TEMP"): (None, False),
    (239684, "05/11/2010, 17:48:48", "HR"): (105.1, True),
    (239684, "05/11/2010, 17:48:48", "TEMP"): (None, False),
    (239684, "05/11/2010, 18:25:35", "HR"): (113.4, True),
    (239684, "05/11/2010, 18:25:35", "TEMP"): (None, False),
    (239684, "05/11/2010, 18:57:18", "HR"): (112.6, True),
    (239684, "05/11/2010, 18:57:18", "TEMP"): (None, False),
    (1195293, None, "HEIGHT"): (164.6868838269085, True),
    (1195293, "06/20/2010, 19:23:52", "HR"): (109.0, True),
    (1195293, "06/20/2010, 19:23:52", "TEMP"): (100.0, True),
    (1195293, "06/20/2010, 19:25:32", "HR"): (114.1, True),
    (1195293, "06/20/2010, 19:25:32", "TEMP"): (100.0, True),
    (1195293, "06/20/2010, 19:45:19", "HR"): (119.8, True),
    (1195293, "06/20/2010, 19:45:19", "TEMP"): (99.9, True),
    (1195293, "06/20/2010, 20:12:31", "HR"): (112.5, True),
    (1195293, "06/20/2010, 20:12:31", "TEMP"): (99.8, True),
    (1195293, "06/20/2010, 20:24:44", "HR"): (107.7, True),
    (1195293, "06/20/2010, 20:24:44", "TEMP"): (100.0, True),
    (1195293, "06/20/2010, 20:41:33", "HR"): (107.5, True),
    (1195293, "06/20/2010, 20:41:33", "TEMP"): (None, False),
    # train/1
    (68729, None, "HEIGHT"): (160.3953106166676, True),
    (68729, "05/26/2010, 02:30:56", "HR"): (None, False),
    (68729, "05/26/2010, 02:30:56", "TEMP"): (97.8, True),
    (814703, None, "HEIGHT"): (None, False),
    (814703, "02/05/2010, 05:55:39", "HR"): (None, False),
    (814703, "02/05/2010, 05:55:39", "TEMP"): (100.1, True),
    # tuning/0
    (754281, None, "HEIGHT"): (166.22261567137025, True),
    (754281, "01/03/2010, 06:27:59", "HR"): (None, False),
    (754281, "01/03/2010, 06:27:59", "TEMP"): (99.8, True),
    # held_out/0
    (1500733, None, "HEIGHT"): (158.60131573580904, True),
    (1500733, "06/03/2010, 14:54:38", "HR"): (None, False),
    (1500733, "06/03/2010, 14:54:38", "TEMP"): (100.0, True),
    (1500733, "06/03/2010, 15:39:49", "HR"): (None, False),
    (1500733, "06/03/2010, 15:39:49", "TEMP"): (100.3, True),
    (1500733, "06/03/2010, 16:20:49", "HR"): (None, False),
    (1500733, "06/03/2010, 16:20:49", "TEMP"): (100.1, True),
}


def test_golden_occlude_outliers(shards, code_metadata):
    for name, df in shards.items():
        out = occlude_outliers(df, code_metadata, stddev_cutoff=1)
        for r in out.collect():
            key = (
                r["patient_id"],
                r["time"].strftime(TS_FMT) if r["time"] else None,
                r["code"],
            )
            if key in OCCLUDE_FLAGS:
                want_val, want_flag = OCCLUDE_FLAGS[key]
                assert r["numeric_value/is_inlier"] == want_flag, key
                if want_val is None:
                    assert r["numeric_value"] is None, key
                else:
                    assert abs(r["numeric_value"] - want_val) <= 1e-4, key
            else:
                # codes with no stats / no value: value untouched, flag null
                assert r["numeric_value/is_inlier"] is None, key


# --- fit_vocabulary_indices: reference test_fit_vocabulary_indices.py -------


def test_golden_fit_vocabulary_indices(code_metadata):
    """Lexicographic 1-based rank, nulls first: null->1 ... TEMP->12."""
    got = {
        r["code"]: r["code/vocab_index"]
        for r in fit_vocabulary_indices(code_metadata).collect()
    }
    want = {
        None: 1,
        "ADMISSION//CARDIAC": 2,
        "ADMISSION//ORTHOPEDIC": 3,
        "ADMISSION//PULMONARY": 4,
        "DISCHARGE": 5,
        "DOB": 6,
        "EYE_COLOR//BLUE": 7,
        "EYE_COLOR//BROWN": 8,
        "EYE_COLOR//HAZEL": 9,
        "HEIGHT": 10,
        "HR": 11,
        "TEMP": 12,
    }
    assert got == want


# --- normalization: reference test_normalization.py -------------------------

NORMALIZED_WANT = {
    "train/0": """
239684,,7,
239684,,9,1.5770289975852931
239684,"12/28/1980, 00:00:00",5,
239684,"05/11/2010, 17:41:51",1,
239684,"05/11/2010, 17:41:51",10,-0.5697368239808219
239684,"05/11/2010, 17:41:51",11,-1.2714603102818045
239684,"05/11/2010, 17:48:48",10,-0.4375473056558053
239684,"05/11/2010, 17:48:48",11,-1.16801957848805
239684,"05/11/2010, 18:25:35",10,0.0013218951832504667
239684,"05/11/2010, 18:25:35",11,-1.3749010420755592
239684,"05/11/2010, 18:57:18",10,-0.04097875068075545
239684,"05/11/2010, 18:57:18",11,-1.5300621397661873
239684,"05/11/2010, 19:27:19",4,
1195293,,6,
1195293,,9,0.0680278558478863
1195293,"06/20/1978, 00:00:00",5,
1195293,"06/20/2010, 19:23:52",1,
1195293,"06/20/2010, 19:23:52",10,-0.23133165706877906
1195293,"06/20/2010, 19:23:52",11,0.7973543255932579
1195293,"06/20/2010, 19:25:32",10,0.03833496031425452
1195293,"06/20/2010, 19:25:32",11,0.7973543255932579
1195293,"06/20/2010, 19:45:19",10,0.3397270620952925
1195293,"06/20/2010, 19:45:19",11,0.7456339596963844
1195293,"06/20/2010, 20:12:31",10,-0.046266331413755815
1195293,"06/20/2010, 20:12:31",11,0.6939135937995033
1195293,"06/20/2010, 20:24:44",10,-0.30007020659778755
1195293,"06/20/2010, 20:24:44",11,0.7973543255932579
1195293,"06/20/2010, 20:41:33",10,-0.31064536806378906
1195293,"06/20/2010, 20:41:33",11,1.0042357891807672
1195293,"06/20/2010, 20:50:04",4,
""",
    "train/1": """
68729,,8,
68729,,9,-0.543824685211534
68729,"03/09/1978, 00:00:00",5,
68729,"05/26/2010, 02:30:56",3,
68729,"05/26/2010, 02:30:56",10,-1.4474752256589318
68729,"05/26/2010, 02:30:56",11,-0.3404937241380279
68729,"05/26/2010, 04:51:52",4,
814703,,8,
814703,,9,-1.101236106768607
814703,"03/28/1976, 00:00:00",5,
814703,"02/05/2010, 05:55:39",2,
814703,"02/05/2010, 05:55:39",10,3.0046677515276268
814703,"02/05/2010, 05:55:39",11,0.8490746914901316
814703,"02/05/2010, 07:02:30",4,
""",
    "tuning/0": """
754281,,7,
754281,,9,0.28697820001946645
754281,"12/19/1988, 00:00:00",5,
754281,"01/03/2010, 06:27:59",3,
754281,"01/03/2010, 06:27:59",10,1.5135699848214401
754281,"01/03/2010, 06:27:59",11,0.6939135937995033
754281,"01/03/2010, 08:22:13",4,
""",
    "held_out/0": """
1500733,,7,
1500733,,9,-0.7995957679188177
1500733,"07/20/1986, 00:00:00",5,
1500733,"06/03/2010, 14:54:38",2,
1500733,"06/03/2010, 14:54:38",10,-1.1619458660768958
1500733,"06/03/2010, 14:54:38",11,0.7973543255932579
1500733,"06/03/2010, 15:39:49",10,-1.5320765173869422
1500733,"06/03/2010, 15:39:49",11,0.9525154232838862
1500733,"06/03/2010, 16:20:49",10,-1.230684415605905
1500733,"06/03/2010, 16:20:49",11,0.8490746914901316
1500733,"06/03/2010, 16:44:26",4,
""",
}


def _parse_normalized(csv_str):
    rows = []
    for rec in _parse_rows(csv_str):
        # code column is the vocab index (int) in normalized output
        rows.append((rec[0], rec[1], int(rec[2]), rec[3]))
    return rows


def test_golden_normalization(shards, normalization_metadata):
    # tol 5e-4, wider than the other golden checks: the reference computes
    # var = E[x²] − mean² with float32 intermediates, and the two ~9694
    # terms cancel to ~3.7 — f32 rounding of the big terms leaves ~1e-4
    # relative error in the GOLDEN std itself. This engine keeps float64
    # (more accurate); matching tighter would mean emulating f32 loss.
    for name, df in shards.items():
        out = normalize(df, normalization_metadata)
        got = [
            (r["patient_id"], r["time"], r["code"], r["numeric_value"])
            for r in out.collect()
        ]
        want = _parse_normalized(NORMALIZED_WANT[name])
        got.sort(key=lambda r: (r[0], r[1] or datetime.min, r[2]))
        want.sort(key=lambda r: (r[0], r[1] or datetime.min, r[2]))
        assert len(got) == len(want), name
        for g, w in zip(got, want):
            assert g[:3] == w[:3], (name, g, w)
            if w[3] is None:
                assert g[3] is None, (name, g, w)
            else:
                assert g[3] is not None and abs(g[3] - w[3]) <= 5e-4, (name, g, w)


# --- add_time_derived_measurements: test_add_time_derived_measurements.py ---

# AGE values from the reference's golden (seconds_in_year = 31556926.08)
GOLDEN_AGES = {
    (239684, "05/11/2010, 17:41:51"): 29.36883360091833,
    (239684, "05/11/2010, 17:48:48"): 29.36884681513314,
    (239684, "05/11/2010, 18:25:35"): 29.36891675223647,
    (239684, "05/11/2010, 18:57:18"): 29.36897705595538,
    (239684, "05/11/2010, 19:27:19"): 29.369034127420306,
    (1195293, "06/20/2010, 19:23:52"): 32.002896271955265,
    (1195293, "06/20/2010, 19:25:32"): 32.00289944083172,
    (1195293, "06/20/2010, 19:45:19"): 32.00293705539522,
    (1195293, "06/20/2010, 20:12:31"): 32.002988771458945,
    (1195293, "06/20/2010, 20:24:44"): 32.00301199932335,
    (1195293, "06/20/2010, 20:41:33"): 32.003043973286765,
    (1195293, "06/20/2010, 20:50:04"): 32.00306016624544,
    (68729, "05/26/2010, 02:30:56"): 32.214527277556684,
    (68729, "05/26/2010, 04:51:52"): 32.21479523774959,
    (814703, "02/05/2010, 05:55:39"): 33.86039997340577,
    (814703, "02/05/2010, 07:02:30"): 33.860527077040324,
    (754281, "01/03/2010, 06:27:59"): 21.04157031380922,
    (754281, "01/03/2010, 08:22:13"): 21.04178750860134,
    (1500733, "06/03/2010, 14:54:38"): 23.873531791091356,
    (1500733, "06/03/2010, 15:39:49"): 23.873617699332012,
    (1500733, "06/03/2010, 16:20:49"): 23.873695653692767,
    (1500733, "06/03/2010, 16:44:26"): 23.873740556672114,
}

GOLDEN_TOD = {
    (239684, "12/28/1980, 00:00:00"): "TIME_OF_DAY//[00,06)",
    (239684, "05/11/2010, 17:41:51"): "TIME_OF_DAY//[12,18)",
    (239684, "05/11/2010, 17:48:48"): "TIME_OF_DAY//[12,18)",
    (239684, "05/11/2010, 18:25:35"): "TIME_OF_DAY//[18,24)",
    (239684, "05/11/2010, 18:57:18"): "TIME_OF_DAY//[18,24)",
    (239684, "05/11/2010, 19:27:19"): "TIME_OF_DAY//[18,24)",
    (1195293, "06/20/1978, 00:00:00"): "TIME_OF_DAY//[00,06)",
    (1195293, "06/20/2010, 19:23:52"): "TIME_OF_DAY//[18,24)",
    (1195293, "06/20/2010, 19:25:32"): "TIME_OF_DAY//[18,24)",
    (1195293, "06/20/2010, 19:45:19"): "TIME_OF_DAY//[18,24)",
    (1195293, "06/20/2010, 20:12:31"): "TIME_OF_DAY//[18,24)",
    (1195293, "06/20/2010, 20:24:44"): "TIME_OF_DAY//[18,24)",
    (1195293, "06/20/2010, 20:41:33"): "TIME_OF_DAY//[18,24)",
    (1195293, "06/20/2010, 20:50:04"): "TIME_OF_DAY//[18,24)",
    (68729, "03/09/1978, 00:00:00"): "TIME_OF_DAY//[00,06)",
    (68729, "05/26/2010, 02:30:56"): "TIME_OF_DAY//[00,06)",
    (68729, "05/26/2010, 04:51:52"): "TIME_OF_DAY//[00,06)",
    (814703, "03/28/1976, 00:00:00"): "TIME_OF_DAY//[00,06)",
    (814703, "02/05/2010, 05:55:39"): "TIME_OF_DAY//[00,06)",
    (814703, "02/05/2010, 07:02:30"): "TIME_OF_DAY//[06,12)",
    (754281, "12/19/1988, 00:00:00"): "TIME_OF_DAY//[00,06)",
    (754281, "01/03/2010, 06:27:59"): "TIME_OF_DAY//[06,12)",
    (754281, "01/03/2010, 08:22:13"): "TIME_OF_DAY//[06,12)",
    (1500733, "07/20/1986, 00:00:00"): "TIME_OF_DAY//[00,06)",
    (1500733, "06/03/2010, 14:54:38"): "TIME_OF_DAY//[12,18)",
    (1500733, "06/03/2010, 15:39:49"): "TIME_OF_DAY//[12,18)",
    (1500733, "06/03/2010, 16:20:49"): "TIME_OF_DAY//[12,18)",
    (1500733, "06/03/2010, 16:44:26"): "TIME_OF_DAY//[12,18)",
}


def test_golden_add_time_derived(shards):
    cfg = {
        "age": {"DOB_code": "DOB", "age_code": "AGE", "age_unit": "years"},
        "time_of_day": {"time_of_day_code": "TIME_OF_DAY"},
    }
    for name, df in shards.items():
        rows = [tuple(r) for r in add_time_derived_measurements(df, cfg).collect()]
        ages = {}
        tods = {}
        for pid, ts, code, val in rows:
            ts_s = ts.strftime(TS_FMT) if ts else None
            if code == "AGE":
                ages[(pid, ts_s)] = val
            elif code and code.startswith("TIME_OF_DAY"):
                tods[(pid, ts_s)] = code
        want_ages = {
            k: v for k, v in GOLDEN_AGES.items() if any(r[0] == k[0] for r in rows)
        }
        want_tods = {
            k: v for k, v in GOLDEN_TOD.items() if any(r[0] == k[0] for r in rows)
        }
        assert set(ages) == set(want_ages), name
        for k, v in want_ages.items():
            assert abs(ages[k] - v) <= 1e-9, (name, k, ages[k], v)
        assert tods == want_tods, name
        # interleave order: within a (patient, time), derived rows precede
        # originals, TIME_OF_DAY before AGE (the reference's golden order)
        seqs = _code_seqs(rows)
        for (pid, ts), codes in seqs.items():
            derived = [c for c in codes if c == "AGE" or c.startswith("TIME_OF_DAY")]
            if derived:
                n = len(derived)
                assert codes[:n] == derived, (name, pid, ts, codes)
                if n == 2:
                    assert codes[0].startswith("TIME_OF_DAY"), (name, pid, ts, codes)


# --- reorder_measurements: reference test_reorder_measurements.py -----------

ORDERED_CODE_PATTERNS = [
    "ADMISSION.*",
    "TEMP",
    "HR",
    "EYE_COLOR//B.*",
    "HEIGHT",
    "DISCHARGE.*",
]

# per-(patient, time-string) expected code order, from WANT_* frames
REORDERED_SEQS = {
    (239684, None): ["EYE_COLOR//BROWN", "HEIGHT"],
    (239684, "05/11/2010, 17:41:51"): ["ADMISSION//CARDIAC", "TEMP", "HR"],
    (239684, "05/11/2010, 17:48:48"): ["TEMP", "HR"],
    (68729, None): ["HEIGHT", "EYE_COLOR//HAZEL"],
    (68729, "05/26/2010, 02:30:56"): ["ADMISSION//PULMONARY", "TEMP", "HR"],
    (814703, None): ["HEIGHT", "EYE_COLOR//HAZEL"],
    (814703, "02/05/2010, 05:55:39"): ["ADMISSION//ORTHOPEDIC", "TEMP", "HR"],
    (754281, None): ["EYE_COLOR//BROWN", "HEIGHT"],
    (754281, "01/03/2010, 06:27:59"): ["ADMISSION//PULMONARY", "TEMP", "HR"],
    (1500733, None): ["EYE_COLOR//BROWN", "HEIGHT"],
    (1500733, "06/03/2010, 14:54:38"): ["ADMISSION//ORTHOPEDIC", "TEMP", "HR"],
    (1500733, "06/03/2010, 15:39:49"): ["TEMP", "HR"],
}


def test_golden_reorder_measurements(shards):
    for name, df in shards.items():
        out = reorder_measurements(df, ORDERED_CODE_PATTERNS).select(
            "patient_id", "time", "code", "numeric_value"
        )
        rows = [tuple(r) for r in out.collect()]
        # same content
        _assert_same_rows(rows, [tuple(r) for r in df.collect()])
        # expected per-event order where the golden pins one
        seqs = {
            (pid, ts.strftime(TS_FMT) if ts else None): codes
            for (pid, ts), codes in _code_seqs(rows).items()
        }
        for key, want in REORDERED_SEQS.items():
            if key in seqs:
                assert seqs[key] == want, (name, key, seqs[key])


# --- tokenization: reference test_tokenization.py ---------------------------


@pytest.fixture(scope="module")
def normalized_shards(spark):
    return {
        name: spark.createDataFrame(
            [(p, t, float(c), v) for p, t, c, v in _parse_normalized(csv)],
            "patient_id long, time timestamp, code double, numeric_value double",
        )
        for name, csv in NORMALIZED_WANT.items()
    }


GOLDEN_SCHEMAS = {
    # pid -> (codes, numeric_values, start_time, times)
    239684: ([7, 9], [None, 1.5770289975852931],
             datetime(1980, 12, 28),
             [datetime(1980, 12, 28), datetime(2010, 5, 11, 17, 41, 51),
              datetime(2010, 5, 11, 17, 48, 48), datetime(2010, 5, 11, 18, 25, 35),
              datetime(2010, 5, 11, 18, 57, 18), datetime(2010, 5, 11, 19, 27, 19)]),
    1195293: ([6, 9], [None, 0.0680278558478863],
              datetime(1978, 6, 20),
              [datetime(1978, 6, 20), datetime(2010, 6, 20, 19, 23, 52),
               datetime(2010, 6, 20, 19, 25, 32), datetime(2010, 6, 20, 19, 45, 19),
               datetime(2010, 6, 20, 20, 12, 31), datetime(2010, 6, 20, 20, 24, 44),
               datetime(2010, 6, 20, 20, 41, 33), datetime(2010, 6, 20, 20, 50, 4)]),
    68729: ([8, 9], [None, -0.543824685211534],
            datetime(1978, 3, 9),
            [datetime(1978, 3, 9), datetime(2010, 5, 26, 2, 30, 56),
             datetime(2010, 5, 26, 4, 51, 52)]),
    814703: ([8, 9], [None, -1.101236106768607],
             datetime(1976, 3, 28),
             [datetime(1976, 3, 28), datetime(2010, 2, 5, 5, 55, 39),
              datetime(2010, 2, 5, 7, 2, 30)]),
    754281: ([7, 9], [None, 0.28697820001946645],
             datetime(1988, 12, 19),
             [datetime(1988, 12, 19), datetime(2010, 1, 3, 6, 27, 59),
              datetime(2010, 1, 3, 8, 22, 13)]),
    1500733: ([7, 9], [None, -0.7995957679188177],
              datetime(1986, 7, 20),
              [datetime(1986, 7, 20), datetime(2010, 6, 3, 14, 54, 38),
               datetime(2010, 6, 3, 15, 39, 49), datetime(2010, 6, 3, 16, 20, 49),
               datetime(2010, 6, 3, 16, 44, 26)]),
}

GOLDEN_EVENT_SEQ_CODES = {
    239684: [[5], [1, 10, 11], [10, 11], [10, 11], [10, 11], [4]],
    1195293: [[5], [1, 10, 11], [10, 11], [10, 11], [10, 11], [10, 11], [10, 11], [4]],
    68729: [[5], [3, 10, 11], [4]],
    814703: [[5], [2, 10, 11], [4]],
    754281: [[5], [3, 10, 11], [4]],
    1500733: [[5], [2, 10, 11], [10, 11], [10, 11], [4]],
}

NAN = float("nan")

GOLDEN_EVENT_SEQ_VALUES = {
    239684: [[NAN], [NAN, -0.5697368239808219, -1.2714603102818045],
             [-0.4375473056558053, -1.16801957848805],
             [0.0013218951832504667, -1.3749010420755592],
             [-0.04097875068075545, -1.5300621397661873], [NAN]],
    1195293: [[NAN], [NAN, -0.23133165706877906, 0.7973543255932579],
              [0.03833496031425452, 0.7973543255932579],
              [0.3397270620952925, 0.7456339596963844],
              [-0.046266331413755815, 0.6939135937995033],
              [-0.30007020659778755, 0.7973543255932579],
              [-0.31064536806378906, 1.0042357891807672], [NAN]],
    68729: [[NAN], [NAN, -1.4474752256589318, -0.3404937241380279], [NAN]],
    814703: [[NAN], [NAN, 3.0046677515276268, 0.8490746914901316], [NAN]],
    754281: [[NAN], [NAN, 1.5135699848214401, 0.6939135937995033], [NAN]],
    1500733: [[NAN], [NAN, -1.1619458660768958, 0.7973543255932579],
              [-1.5320765173869422, 0.9525154232838862],
              [-1.230684415605905, 0.8490746914901316], [NAN]],
}

SECONDS_PER_DAY = 86400.0


def _want_deltas(times):
    out = [NAN]
    for a, b in zip(times, times[1:]):
        out.append((b - a).total_seconds() / SECONDS_PER_DAY)
    return out


def _float_list_eq(got, want, tol=1e-4):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if w is None:
            assert g is None
        elif isinstance(w, float) and math.isnan(w):
            assert g is not None and math.isnan(g)
        else:
            assert g is not None and abs(g - w) <= tol, (got, want)


def test_golden_tokenization_schemas(normalized_shards):
    for name, df in normalized_shards.items():
        out = extract_statics_and_schema(df).collect()
        for r in out:
            codes, vals, start, times = GOLDEN_SCHEMAS[r["patient_id"]]
            assert [int(c) for c in r["code"]] == codes, name
            _float_list_eq(r["numeric_value"], vals)
            assert r["start_time"] == start, name
            assert list(r["time"]) == times, name


def test_golden_tokenization_event_seqs(normalized_shards):
    for name, df in normalized_shards.items():
        out = extract_seq_of_patient_events(df).collect()
        for r in out:
            pid = r["patient_id"]
            got_codes = [[int(c) for c in ev] for ev in r["code"]]
            assert got_codes == GOLDEN_EVENT_SEQ_CODES[pid], (name, pid)
            want_vals = GOLDEN_EVENT_SEQ_VALUES[pid]
            assert len(r["numeric_value"]) == len(want_vals)
            for g_ev, w_ev in zip(r["numeric_value"], want_vals):
                _float_list_eq(g_ev, w_ev)
            _, _, _, times = GOLDEN_SCHEMAS[pid]
            _float_list_eq(r["time_delta_days"], _want_deltas(times), tol=1e-9)


def test_golden_tensorization_nrt_roundtrip(normalized_shards, tmp_path):
    """Reference test_tensorization.py parity: the tokenized WANT frames
    written through the NRT sink and read back reproduce every ragged
    value — the reference's JointNestedRaggedTensorDict round-trip
    expressed against this engine's .nrt.npz layout."""
    import numpy as np

    from meds_polars_functions_spark.operators.tokenization import (
        extract_seq_of_patient_events,
    )
    from meds_polars_functions_spark.sources.writers import read_nrt, write_nrt

    for name, df in normalized_shards.items():
        seqs = extract_seq_of_patient_events(df).orderBy("patient_id")
        rows = seqs.collect()
        out_dir = str(tmp_path / name.replace("/", "_"))
        write_nrt(
            seqs.coalesce(1),
            out_dir,
            list_columns=["time_delta_days", "code", "numeric_value"],
        )
        loaded = read_nrt(out_dir)
        # flat deltas: concatenation across patients in written order
        want_deltas = [d for r in rows for d in r["time_delta_days"]]
        np.testing.assert_allclose(
            loaded["time_delta_days__values"], want_deltas, rtol=0, atol=1e-9
        )
        # doubly-nested codes: rebuild per-patient lists from offsets
        offs = loaded["code__offsets"]
        inner = loaded["code__inner_offsets"]
        vals = loaded["code__values"]
        assert len(offs) == len(rows) + 1
        for i, r in enumerate(rows):
            ev_lo, ev_hi = offs[i], offs[i + 1]
            got_events = [
                list(vals[inner[e] : inner[e + 1]]) for e in range(ev_lo, ev_hi)
            ]
            want_events = [list(ev) for ev in r["code"]]
            assert got_events == want_events, (name, r["patient_id"])
