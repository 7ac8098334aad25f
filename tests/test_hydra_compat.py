"""Reference pipeline-YAML compatibility (plans/hydra_compat.py): the
reference's shipped configs/preprocess.yaml loads AS-IS — Hydra defaults
composition, aggregation-variant stage names, is_metadata inference —
and the composed stage list runs end-to-end on a mini cohort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.plans.hydra_compat import (
    build_stages_from_reference,
    default_reference_config_path,
    load_reference_pipeline_yaml,
)
from meds_polars_functions_spark.plans.pipeline import run_pipeline

REF_YAML = default_reference_config_path()


@pytest.mark.skipif(REF_YAML is None, reason="reference tree not present")
def test_reference_preprocess_yaml_loads_asis():
    cfg = load_reference_pipeline_yaml(REF_YAML)
    # the shipped stage list, verbatim (reference configs/preprocess.yaml)
    assert cfg["stages"] == [
        "filter_patients",
        "add_time_derived_measurements",
        "preliminary_counts",
        "filter_measurements",
        "fit_outlier_detection",
        "occlude_outliers",
        "fit_normalization",
        "fit_vocabulary_indices",
        "normalization",
        "tokenization",
        "tensorization",
    ]
    # defaults-composition pulled the shipped stage_config defaults
    assert cfg["stage_configs"]["occlude_outliers"]["stddev_cutoff"] == 4.5
    assert cfg["stage_configs"]["fit_normalization"]["aggregations"] == [
        "code/n_occurrences",
        "code/n_patients",
        "values/n_occurrences",
        "values/sum",
        "values/sum_sqd",
    ]
    # hydra-only keys are gone
    assert "hydra" not in cfg and "defaults" not in cfg

    stages = build_stages_from_reference(cfg)
    assert [s.name for s in stages] == cfg["stages"]
    # is_metadata inference: aggregation stages landed on the metadata track
    kinds = {s.name: s.kind for s in stages}
    assert kinds["preliminary_counts"] == "metadata"
    assert kinds["fit_outlier_detection"] == "metadata"
    assert kinds["fit_normalization"] == "metadata"
    assert kinds["fit_vocabulary_indices"] == "metadata"
    assert kinds["filter_patients"] == "data"
    assert kinds["normalization"] == "data"


@pytest.mark.skipif(REF_YAML is None, reason="reference tree not present")
def test_reference_pipeline_runs_on_mini_cohort(spark, meds_df):
    cfg = load_reference_pipeline_yaml(REF_YAML)
    # run the shipped pipeline through normalization (tokenization /
    # tensorization reshape away from the flat MEDS frame and need a sink
    # dir, so the flat-track check stops before them)
    cfg["stages"] = cfg["stages"][: cfg["stages"].index("normalization") + 1]
    # add_time_derived_measurements needs its sub-config (the reference
    # supplies it per-dataset, not in the shipped defaults)
    cfg["stage_configs"]["add_time_derived_measurements"] = {
        "age": {"DOB_code": "DOB", "age_code": "AGE", "age_unit": "years"},
        "time_of_day": {},
    }
    stages = build_stages_from_reference(cfg)
    data, metadata = run_pipeline(spark, stages, meds_df)
    rows = data.collect()
    assert rows, "pipeline produced no rows"
    # normalization output: codes became vocabulary indices (ints)
    assert dict(data.dtypes)["code"] in ("int", "bigint")
    # metadata track ended as the vocabulary (fit_vocabulary_indices ran last)
    assert "code/vocab_index" in metadata.columns


def test_extract_stage_names_are_rejected_with_pointer():
    with pytest.raises(ValueError, match="extract_cli"):
        build_stages_from_reference({"stages": ["shard_events"]})


def test_unknown_stage_raises():
    with pytest.raises(KeyError, match="unknown stage"):
        build_stages_from_reference({"stages": ["not_a_stage"]})


def test_aggregations_key_implies_metadata_stage():
    stages = build_stages_from_reference(
        {
            "stages": ["my_custom_counts"],
            "stage_configs": {
                "my_custom_counts": {"aggregations": ["code/n_occurrences"]}
            },
        }
    )
    assert stages[0].kind == "metadata"
    assert stages[0].name == "my_custom_counts"
