"""Raw-table -> MEDS event conversion (SURVEY §2.2 P4-P8).

Reference: src/MEDS_transforms/extract/convert_to_sharded_events.py:101-501
(``extract_event``) — given an event config block, project a raw table to
``(patient_id, time, code, numeric_value, *extras)``:

- ``code``: list of literals/column refs joined with ``//``, nulls -> UNK
- ``time``: null (static), a column, or a column parsed via one-or-more
  strptime formats coalesced
- typed value columns coerced non-strictly
- rows with null code parts (first col ref) or unparseable time dropped
- whole-row dedup

All pure column expressions — Catalyst prunes the raw scan down to the
referenced columns automatically (the reference does this by hand,
shard_events.py:165-264).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expr import multi_format_time_parse


def _code_expr_from_cfg(code_cfg: Any) -> tuple[Column, list[Column]]:
    """Reference get_code_expr (convert_to_sharded_events.py:33-98): a code
    config is a literal string, a ``col(...)`` reference, or a list of
    such parts joined by ``//``; null column parts render as ``"UNK"``.
    Returns (code column, null-check columns for mandatory first part)."""
    parts = code_cfg if isinstance(code_cfg, (list, tuple)) else [code_cfg]
    exprs: list[Column] = []
    col_refs: list[Column] = []
    for p in parts:
        if isinstance(p, str) and p.startswith("col(") and p.endswith(")"):
            c = F.col(p[4:-1])
            col_refs.append(c)
            exprs.append(F.coalesce(c.cast("string"), F.lit("UNK")))
        else:
            exprs.append(F.lit(str(p)))
    return F.concat_ws("//", *exprs), col_refs


def extract_event(
    df: DataFrame,
    event_cfg: dict[str, Any],
    patient_id_col: str = "patient_id",
) -> DataFrame:
    """Extract one event stream from a raw table per the event config.

    Config keys (same surface as the reference's event block):
      - ``code`` (required): literal / ``col(...)`` / list of parts
      - ``time`` (required, may be None): null for static events,
        ``col(...)`` for a timestamp column
      - ``time_format``: strptime format or list of formats (coalesced)
      - any other key -> output column from a ``col(...)`` ref or literal;
        ``numeric_value`` is cast to double, ``text_value`` /
        ``categorical_value`` to string.
    """
    cfg = dict(event_cfg)
    code_cfg = cfg.pop("code")
    time_cfg = cfg.pop("time", None)
    time_format = cfg.pop("time_format", None)
    cfg.pop("_metadata", None)
    # per-event id-column override is routing config, not an output column
    # (reference pops it before extraction, convert_to_sharded_events.py:719)
    cfg.pop("patient_id_col", None)

    code, code_col_refs = _code_expr_from_cfg(code_cfg)

    if time_cfg is None:
        time = F.lit(None).cast("timestamp")
    elif isinstance(time_cfg, str) and time_cfg.startswith("col("):
        tcol = F.col(time_cfg[4:-1])
        if time_format:
            formats = time_format if isinstance(time_format, (list, tuple)) else [time_format]
            time = multi_format_time_parse(tcol, list(formats))
        else:
            time = tcol.cast("timestamp")
    else:
        raise ValueError(f"unsupported time config: {time_cfg!r}")

    out_cols = [
        F.col(patient_id_col).cast("long").alias("patient_id"),
        time.alias("time"),
        code.alias("code"),
    ]
    for out_name, v in cfg.items():
        if isinstance(v, str) and v.startswith("col(") and v.endswith(")"):
            c = F.col(v[4:-1])
        else:
            c = F.lit(v)
        if out_name == "numeric_value":
            c = c.cast("double")
        elif out_name in ("text_value", "categorical_value"):
            c = c.cast("string")
        out_cols.append(c.alias(out_name))
    if "numeric_value" not in cfg:
        out_cols.append(F.lit(None).cast("double").alias("numeric_value"))

    # Drop rows whose first (mandatory) code column part is null BEFORE the
    # projection (reference :412) — the filter pushes to the scan. Timed
    # events also drop unparseable/null times (:426-443); then dedup (:499).
    src = df.filter(code_col_refs[0].isNotNull()) if code_col_refs else df
    out = src.select(*out_cols)
    out = out.filter(F.col("code").isNotNull() & (F.col("code") != ""))
    if time_cfg is not None:
        out = out.filter(F.col("time").isNotNull())
    return out.dropDuplicates()


def convert_to_events(
    df: DataFrame,
    table_cfg: dict[str, dict[str, Any]],
    patient_id_col: str = "patient_id",
) -> DataFrame:
    """Run every event block of a table's config and diagonally concat
    (reference convert_to_sharded_events.py:504-668)."""
    from .merge_sort import union_by_name_relaxed

    frames = [
        extract_event(df, ecfg, patient_id_col=ecfg.get("patient_id_col", patient_id_col))
        for name, ecfg in table_cfg.items()
    ]
    return union_by_name_relaxed(frames)
