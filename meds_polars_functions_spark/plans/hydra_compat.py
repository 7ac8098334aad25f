"""Reference pipeline-YAML compatibility: consume the reference's Hydra
config files as-is, no hand translation.

Reference surface reproduced here:

- ``configs/pipeline.yaml`` / ``configs/preprocess.yaml`` (the shipped
  pipeline definitions, with Hydra ``defaults:`` composition of
  ``stage_configs/*.yaml``);
- ``populate_stage``'s inference rules (reference utils.py:183-363):
  a stage with an ``aggregations`` key is a METADATA stage; anything else
  is a data stage; explicit ``is_metadata`` overrides;
- the stage-name indirection where ``preliminary_counts``,
  ``count_code_occurrences``, ``fit_outlier_detection`` and
  ``fit_normalization`` are all the code-metadata aggregation stage run
  with different aggregation lists (reference
  configs/stage_configs/{count_code_occurrences,fit_outlier_detection,
  fit_normalization}.yaml).

Hydra itself is not required: the subset of Hydra used by the reference
configs (a ``defaults`` list naming stage_config groups, ``???``
mandatory markers, ``${...}`` interpolations for logging paths) is parsed
structurally — interpolation-valued and ``???`` keys are dropped because
the Spark runner derives IO wiring from the DataFrame DAG instead of
directories.
"""

from __future__ import annotations

import os
from typing import Any

from .pipeline import Stage
from .registry import STAGE_REGISTRY

#: Default stage configs shipped by the reference as
#: ``configs/stage_configs/*.yaml`` — reproduced as data (semantics, not
#: file copies) so a pipeline YAML whose ``defaults:`` names them composes
#: without the reference package installed.
REFERENCE_STAGE_DEFAULTS: dict[str, dict[str, Any]] = {
    # stage_configs/filter_patients.yaml
    "filter_patients": {
        "min_events_per_patient": None,
        "min_measurements_per_patient": None,
    },
    # stage_configs/occlude_outliers.yaml
    "occlude_outliers": {"stddev_cutoff": 4.5},
    # stage_configs/count_code_occurrences.yaml
    "count_code_occurrences": {
        "aggregations": ["code/n_occurrences", "code/n_patients"],
        "do_summarize_over_all_codes": True,
    },
    # the preliminary counts pass is the same aggregation stage
    "preliminary_counts": {
        "aggregations": ["code/n_occurrences", "code/n_patients"],
    },
    # stage_configs/fit_outlier_detection.yaml
    "fit_outlier_detection": {
        "aggregations": ["values/n_occurrences", "values/sum", "values/sum_sqd"],
    },
    # stage_configs/fit_normalization.yaml
    "fit_normalization": {
        "aggregations": [
            "code/n_occurrences",
            "code/n_patients",
            "values/n_occurrences",
            "values/sum",
            "values/sum_sqd",
        ],
    },
    # stage_configs/filter_measurements.yaml
    "filter_measurements": {
        "min_patients_per_code": None,
        "min_occurrences_per_code": None,
    },
    "add_time_derived_measurements": {},
    "fit_vocabulary_indices": {},
    "normalization": {},
    "reorder_measurements": {},
    "tokenization": {},
    "tensorization": {},
}

#: reference stage name -> registry factory name. Names not listed map to
#: themselves. The aggregation-variant stages all route to
#: aggregate_code_metadata; ``tokenization`` routes to the event-sequence
#: track (the schemas side-output has its own stage name).
STAGE_ALIASES: dict[str, str] = {
    "preliminary_counts": "aggregate_code_metadata",
    "count_code_occurrences": "aggregate_code_metadata",
    "fit_outlier_detection": "aggregate_code_metadata",
    "fit_normalization": "aggregate_code_metadata",
    "tokenization": "tokenization_event_seqs",
}

#: Extract-track stages are ONE Spark job here (plans/extract_cli.py), not
#: per-stage scripts; naming them in a preprocess pipeline is an error
#: pointing at the right tool rather than a silent skip.
EXTRACT_TRACK_STAGES = frozenset(
    {
        "shard_events",
        "split_and_shard_patients",
        "convert_to_sharded_events",
        "merge_to_MEDS_cohort",
        "extract_code_metadata",
        "finalize_MEDS_data",
        "finalize_MEDS_metadata",
    }
)


def _is_hydra_artifact(value: Any) -> bool:
    """True for values the Spark runner cannot (and need not) resolve:
    Hydra mandatory markers and interpolation strings."""
    return isinstance(value, str) and ("???" in value or "${" in value)


def load_reference_pipeline_yaml(path: str) -> dict[str, Any]:
    """Parse a reference pipeline YAML (e.g. the shipped preprocess.yaml)
    into a plain config dict: resolves the ``defaults:`` stage_config
    composition against REFERENCE_STAGE_DEFAULTS, drops Hydra-only keys,
    and returns ``{"stages": [...], "stage_configs": {...}, **rest}``.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)

    cfg: dict[str, Any] = {}
    composed: dict[str, dict[str, Any]] = {}

    # defaults list: entries like "pipeline" (the base config — IO/log
    # wiring we derive from the DAG, so it is structural only) and
    # {"stage_configs": [names...]} which compose shipped defaults.
    for entry in raw.get("defaults", []) or []:
        if isinstance(entry, dict):
            for group, names in entry.items():
                if group != "stage_configs":
                    continue
                for name in names or []:
                    if name in REFERENCE_STAGE_DEFAULTS:
                        composed[name] = dict(REFERENCE_STAGE_DEFAULTS[name])

    for key, value in raw.items():
        if key in ("defaults", "hydra") or key.startswith("_"):
            continue
        if _is_hydra_artifact(value):
            continue
        cfg[key] = value

    user_stage_cfgs = cfg.pop("stage_configs", None) or {}
    for name, scfg in user_stage_cfgs.items():
        merged = composed.get(name, {})
        merged.update(scfg or {})
        composed[name] = merged
    cfg["stage_configs"] = composed

    stages = cfg.get("stages")
    if not stages or _is_hydra_artifact(stages):
        raise ValueError(f"pipeline YAML {path!r} declares no concrete stages")
    return cfg


def build_stages_from_reference(cfg: dict[str, Any]) -> list[Stage]:
    """Reference config dict -> runnable Stage list.

    Applies ``populate_stage``'s is_metadata inference: any stage whose
    (composed) config carries ``aggregations`` runs the code-metadata
    aggregation stage; explicit registry names take precedence; extract
    stages raise with a pointer to the extract CLI."""
    stage_configs = cfg.get("stage_configs", {})
    stages: list[Stage] = []
    for name in cfg["stages"]:
        scfg = dict(
            REFERENCE_STAGE_DEFAULTS.get(name, {}),
            **(stage_configs.get(name, {}) or {}),
        )
        if name in EXTRACT_TRACK_STAGES:
            raise ValueError(
                f"stage {name!r} belongs to the extraction pipeline; run "
                "`python -m meds_polars_functions_spark.plans.extract_cli` "
                "(the whole extract track is one Spark job here)"
            )
        target = STAGE_ALIASES.get(name, name)
        if target not in STAGE_REGISTRY and "aggregations" in scfg:
            # populate_stage inference: aggregations => metadata stage
            target = "aggregate_code_metadata"
        if target not in STAGE_REGISTRY:
            raise KeyError(
                f"unknown stage {name!r} (resolved {target!r}); known: "
                f"{sorted(STAGE_REGISTRY)}"
            )
        stage = STAGE_REGISTRY[target](scfg)
        # keep the pipeline-YAML name for checkpoints/logs even when several
        # stages share a factory (preliminary_counts vs fit_normalization)
        stage.name = name
        stages.append(stage)
    return stages


def load_reference_pipeline(path: str) -> list[Stage]:
    """One-call form: YAML path -> Stage list."""
    return build_stages_from_reference(load_reference_pipeline_yaml(path))


def default_reference_config_path() -> str | None:
    """The reference's shipped preprocess.yaml, when the reference tree is
    present (used by tests; not required at runtime)."""
    p = "/root/reference/src/MEDS_transforms/configs/preprocess.yaml"
    return p if os.path.exists(p) else None
