"""YAML pipeline CLI driven as a real subprocess — the engine's
equivalent of the reference's stage console scripts."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

PIPELINE_YAML = """
stages:
  - filter_patients
  - aggregate_code_metadata
  - fit_vocabulary_indices
  - normalization
stage_configs:
  filter_patients:
    min_measurements_per_patient: 5
"""


@pytest.fixture()
def workdir(spark, meds_df):
    d = tempfile.mkdtemp(prefix="cli_")
    meds_df.write.parquet(os.path.join(d, "input"))
    with open(os.path.join(d, "pipeline.yaml"), "w") as f:
        f.write(PIPELINE_YAML)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_cli_pipeline(workdir, spark):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "meds_polars_functions_spark.plans.cli",
            "--config", os.path.join(workdir, "pipeline.yaml"),
            "--input", os.path.join(workdir, "input"),
            "--output", os.path.join(workdir, "out"),
            "--checkpoint-dir", os.path.join(workdir, "ckpt"),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        open(os.path.join(workdir, "out", "pipeline_summary.json")).read()
    )
    assert summary["stages"][0] == "filter_patients"
    assert summary["rows_out"] > 0
    assert summary["metadata_rows_out"] > 0

    data = spark.read.parquet(os.path.join(workdir, "out", "data"))
    # normalized output: integer vocab codes, z-scored values
    assert dict(data.dtypes)["code"] == "bigint"
    meta = spark.read.parquet(os.path.join(workdir, "out", "metadata"))
    assert "code/vocab_index" in meta.columns
    # patient 68729 has only 4 measurements -> dropped by the >=5 filter
    kept = {r["patient_id"] for r in data.select("patient_id").distinct().collect()}
    assert 68729 not in kept
    assert {239684, 1195293} <= kept


FULL_PIPELINE_YAML = """
stages:
  - aggregate_code_metadata
  - fit_vocabulary_indices
  - normalization
  - tokenization_event_seqs
  - tensorization
stage_configs:
  tensorization:
    nrt_dir: "{nrt_dir}"
"""


@pytest.mark.slow
def test_cli_full_pipeline_to_tensors(workdir, spark):
    """extract-output -> normalize -> tokenize -> NRT files: the entire
    reference pipeline, end to end through the CLI."""
    import glob

    yaml_path = os.path.join(workdir, "full.yaml")
    nrt_dir = os.path.join(workdir, "nrt")
    with open(yaml_path, "w") as f:
        f.write(FULL_PIPELINE_YAML.replace("{nrt_dir}", nrt_dir))
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            sys.executable, "-m", "meds_polars_functions_spark.plans.cli",
            "--config", yaml_path,
            "--input", os.path.join(workdir, "input"),
            "--output", os.path.join(workdir, "out_full"),
        ],
        capture_output=True, text=True, timeout=420, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert glob.glob(os.path.join(nrt_dir, "*.nrt.npz"))
    seqs = spark.read.parquet(os.path.join(workdir, "out_full", "data"))
    assert {"patient_id", "time_delta_days", "code", "numeric_value"} <= set(seqs.columns)
    row = seqs.first()
    assert isinstance(row["code"][0], list)  # doubly-nested, normalized codes


def test_new_registry_stages_run_in_process(spark, meds_df):
    from meds_polars_functions_spark.plans.pipeline import Pipeline
    from meds_polars_functions_spark.plans.registry import build_stages

    cfg = {
        "stages": ["dedup_keep_first", "locf_impute", "profile"],
        "stage_configs": {
            "dedup_keep_first": {
                "subset": ["patient_id", "time", "code"],
                "order_by": ["numeric_value"],
            },
            "locf_impute": {"tie_cols": ["code"]},
            "profile": {"columns": ["code", "numeric_value"]},
        },
    }
    data, meta = Pipeline(build_stages(cfg)).run(spark, meds_df)
    assert data.count() > 0
    prof = {r["column"]: r for r in meta.collect()}
    assert set(prof) == {"code", "numeric_value"}
    assert prof["code"]["n_nulls"] == 0
