"""Extraction CLI driven as a subprocess on raw CSVs — the reference's
full extract pipeline as one Spark job."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

EVENTS_YAML = """
subjects:
  patient_id_col: MRN
  eye_color:
    code: [EYE_COLOR, "col(eye_color)"]
    time: null
  height:
    code: HEIGHT
    time: null
    numeric_value: "col(height)"
  dob:
    code: DOB
    time: "col(dob)"
    time_format: "%m/%d/%Y"
vitals:
  hr:
    code: HR
    time: "col(vitals_date)"
    time_format: "%m/%d/%Y, %H:%M:%S"
    numeric_value: "col(HR)"
"""

SUBJECTS_CSV = """MRN,dob,eye_color,height
239684,12/28/1980,BROWN,175.271
1195293,06/20/1978,BLUE,164.687
68729,03/09/1978,HAZEL,160.395
814703,03/28/1976,HAZEL,156.486
"""

VITALS_CSV = """patient_id,vitals_date,HR
239684,"05/11/2010, 17:41:51",102.6
239684,"05/11/2010, 17:48:48",105.1
1195293,"06/20/2010, 19:23:52",109.0
68729,"05/26/2010, 02:30:56",86.0
814703,"02/05/2010, 05:55:39",170.2
"""


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="extract_cli_")
    with open(os.path.join(d, "events.yaml"), "w") as f:
        f.write(EVENTS_YAML)
    with open(os.path.join(d, "subjects.csv"), "w") as f:
        f.write(SUBJECTS_CSV)
    with open(os.path.join(d, "vitals.csv"), "w") as f:
        f.write(VITALS_CSV)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_extract_cli(workdir, spark):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            sys.executable, "-m", "meds_polars_functions_spark.plans.extract_cli",
            "--event-config", os.path.join(workdir, "events.yaml"),
            "--table", f"subjects={os.path.join(workdir, 'subjects.csv')}",
            "--table", f"vitals={os.path.join(workdir, 'vitals.csv')}",
            "--output", os.path.join(workdir, "out"),
            "--split-seed", "1",
            "--train-frac", "0.5", "--tuning-frac", "0.25", "--held-out-frac", "0.25",
        ],
        capture_output=True, text=True, timeout=420, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(open(os.path.join(workdir, "out", "extract_summary.json")).read())
    # 4 static EYE_COLOR + 4 HEIGHT + 4 DOB + 5 HR = 17 measurements
    assert summary["rows"] == 17
    assert summary["patients"] == 4

    data = spark.read.parquet(os.path.join(workdir, "out", "data"))
    assert set(data.columns) >= {"patient_id", "time", "code", "numeric_value", "split"}
    assert data.count() == 17
    codes = {r["code"] for r in data.select("code").distinct().collect()}
    assert "EYE_COLOR//BROWN" in codes and "HR" in codes

    meta = spark.read.parquet(os.path.join(workdir, "out", "metadata", "codes"))
    hr = [r for r in meta.collect() if r["code"] == "HR"][0]
    assert hr["code/n_occurrences"] == 5
    splits = json.loads(open(os.path.join(workdir, "out", "metadata", "splits.json")).read())
    assert sum(len(v) for v in splits.values()) == 4
