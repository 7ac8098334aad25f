"""Stage registry: name -> stage factory, mirroring the reference's
console-script-per-stage surface (reference pyproject.toml:31-54) as a
single YAML-driven runner.

Each factory takes the stage's config dict and returns a ``Stage`` whose
fn is ``(data, code_metadata=None, **kwargs) -> DataFrame``. Metadata
stages (kind="metadata") replace the metadata track, mirroring the
reference's is_metadata classification (utils.py:141-180).
"""

from __future__ import annotations

from typing import Any

from .pipeline import Stage


def _filter_patients(cfg: dict[str, Any]) -> Stage:
    from ..operators.filter_patients import filter_patients

    return Stage(
        "filter_patients",
        lambda df: filter_patients(
            df,
            min_measurements=cfg.get("min_measurements_per_patient"),
            min_events=cfg.get("min_events_per_patient"),
        ),
    )


def _filter_measurements(cfg: dict[str, Any]) -> Stage:
    from ..operators.filter_measurements import filter_measurements

    return Stage(
        "filter_measurements",
        lambda df, code_metadata=None: filter_measurements(
            df,
            code_metadata,
            min_patients_per_code=cfg.get("min_patients_per_code"),
            min_occurrences_per_code=cfg.get("min_occurrences_per_code"),
        ),
        wants_metadata=True,
    )


def _occlude_outliers(cfg: dict[str, Any]) -> Stage:
    from ..operators.occlude_outliers import occlude_outliers

    return Stage(
        "occlude_outliers",
        lambda df, code_metadata=None: occlude_outliers(
            df, code_metadata, stddev_cutoff=cfg.get("stddev_cutoff", 4.5)
        ),
        wants_metadata=True,
    )


def _normalization(cfg: dict[str, Any]) -> Stage:
    from ..operators.normalization import normalize

    return Stage(
        "normalization",
        lambda df, code_metadata=None: normalize(df, code_metadata),
        wants_metadata=True,
    )


def _add_time_derived(cfg: dict[str, Any]) -> Stage:
    from ..operators.add_time_derived_measurements import (
        add_time_derived_measurements,
    )

    return Stage(
        "add_time_derived_measurements",
        lambda df: add_time_derived_measurements(df, cfg),
    )


def _reorder_measurements(cfg: dict[str, Any]) -> Stage:
    from ..operators.reorder_measurements import reorder_measurements

    return Stage(
        "reorder_measurements",
        lambda df: reorder_measurements(df, cfg["ordered_code_patterns"]),
    )


def _aggregate_code_metadata(cfg: dict[str, Any]) -> Stage:
    from ..operators.aggregate_code_metadata import (
        ALL_AGGREGATIONS,
        aggregate_code_metadata,
    )

    return Stage(
        "aggregate_code_metadata",
        lambda df: aggregate_code_metadata(
            df,
            aggregations=cfg.get("aggregations", ALL_AGGREGATIONS),
            do_summarize_over_all_codes=cfg.get("do_summarize_over_all_codes", False),
        ),
        kind="metadata",
    )


def _fit_vocabulary_indices(cfg: dict[str, Any]) -> Stage:
    from ..operators.fit_vocabulary_indices import fit_vocabulary_indices
    from ..operators.aggregate_code_metadata import aggregate_code_metadata

    def fn(df, code_metadata=None):
        meta = code_metadata if code_metadata is not None else aggregate_code_metadata(df)
        return fit_vocabulary_indices(meta)

    return Stage("fit_vocabulary_indices", fn, kind="metadata", wants_metadata=True)


def _tokenization_schemas(cfg: dict[str, Any]) -> Stage:
    from ..operators.tokenization import extract_statics_and_schema

    return Stage(
        "tokenization_schemas",
        lambda df: extract_statics_and_schema(df, order_col=cfg.get("order_col")),
    )


def _tokenization_event_seqs(cfg: dict[str, Any]) -> Stage:
    from ..operators.tokenization import extract_seq_of_patient_events

    return Stage(
        "tokenization_event_seqs",
        lambda df: extract_seq_of_patient_events(
            df,
            order_col=cfg.get("order_col"),
            code_as_double=cfg.get("code_as_double", True),
            nan_fill=cfg.get("nan_fill", True),
        ),
    )


def _tensorization(cfg: dict[str, Any]) -> Stage:
    """Terminal stage: write the nested sequences as ragged-tensor files
    (reference transforms/tensorization.py). ``nrt_dir`` is required; the
    DataFrame passes through unchanged so the pipeline can still
    checkpoint/inspect it."""
    from ..sources.writers import write_nrt

    nrt_dir = cfg.get("nrt_dir")
    list_columns = cfg.get(
        "list_columns", ["time_delta_days", "code", "numeric_value"]
    )

    def fn(df):
        # construction-time tolerance lets reference pipeline YAMLs (whose
        # IO dirs are Hydra ??? placeholders) load and plan; execution
        # still demands a concrete sink
        if nrt_dir is None:
            raise ValueError(
                "tensorization requires stage config 'nrt_dir' (the "
                "reference derives it from cohort_dir, which is a Hydra "
                "placeholder in shipped configs)"
            )
        write_nrt(df, nrt_dir, list_columns=list_columns)
        return df

    return Stage("tensorization", fn)


def _locf_impute(cfg: dict[str, Any]) -> Stage:
    from ..operators.temporal import locf_impute

    return Stage(
        "locf_impute",
        lambda df: locf_impute(
            df,
            cfg.get("key_cols", ["patient_id", "code"]),
            cfg.get("time_col", "time"),
            cfg.get("value_col", "numeric_value"),
            tie_cols=cfg.get("tie_cols"),
        ),
    )


def _resample_interpolate(cfg: dict[str, Any]) -> Stage:
    from ..operators.temporal import resample_interpolate

    return Stage(
        "resample_interpolate",
        lambda df: resample_interpolate(
            df,
            cfg.get("key_cols", ["patient_id", "code"]),
            cfg.get("time_col", "time"),
            cfg.get("value_col", "numeric_value"),
            step_seconds=cfg.get("step_seconds", 86400),
            tie_cols=cfg.get("tie_cols", ()),
        ),
    )


def _dedup_keep_first(cfg: dict[str, Any]) -> Stage:
    from ..functions.expr import keep_first

    def fn(df):
        subset = cfg.get("subset") or list(df.columns)
        order_by = cfg.get("order_by") or subset
        return keep_first(df, subset, order_by)

    return Stage("dedup_keep_first", fn)


def _profile(cfg: dict[str, Any]) -> Stage:
    from ..functions.profile import profile_table

    return Stage(
        "profile",
        lambda df: profile_table(
            df, columns=cfg.get("columns"), approx=cfg.get("approx", False)
        ),
        kind="metadata",
    )


STAGE_REGISTRY = {
    "filter_patients": _filter_patients,
    "filter_measurements": _filter_measurements,
    "occlude_outliers": _occlude_outliers,
    "normalization": _normalization,
    "add_time_derived_measurements": _add_time_derived,
    "reorder_measurements": _reorder_measurements,
    "aggregate_code_metadata": _aggregate_code_metadata,
    "fit_vocabulary_indices": _fit_vocabulary_indices,
    "tokenization_schemas": _tokenization_schemas,
    "tokenization_event_seqs": _tokenization_event_seqs,
    "tensorization": _tensorization,
    "locf_impute": _locf_impute,
    "resample_interpolate": _resample_interpolate,
    "dedup_keep_first": _dedup_keep_first,
    "profile": _profile,
}


def build_stages(pipeline_cfg: dict[str, Any]) -> list[Stage]:
    """pipeline_cfg: {"stages": [name, ...], "stage_configs": {name: {...}}}
    — the reference's pipeline.yaml shape (configs/pipeline.yaml)."""
    stage_configs = pipeline_cfg.get("stage_configs", {})
    stages = []
    for name in pipeline_cfg["stages"]:
        if name not in STAGE_REGISTRY:
            raise KeyError(
                f"unknown stage {name!r}; known: {sorted(STAGE_REGISTRY)}"
            )
        stages.append(STAGE_REGISTRY[name](stage_configs.get(name, {}) or {}))
    return stages
