"""Structured column-expression DSL compiler (SURVEY §2.2 P9).

Re-implements the semantics of the reference's extract-config DSL
(reference src/MEDS_transforms/extract/parser.py:41-491) as a compiler to
``pyspark.sql.Column`` expressions:

- **matchers**: ``{col_name: value, ...}`` -> conjunction of equality tests.
- **column expressions**:
  - ``{"col": name}`` — column reference
  - ``{"str": "A//{x}//{y}"}`` — f-string interpolation over columns
  - ``{"literal": v}`` — literal value
  - bare string — ``col`` if no ``{...}`` targets, else ``str``
  - ordered list — coalesce, first non-null wins
  - ``{"output": expr, "matcher": {...}}`` or ``{"<expr str>": {...}}``
    — conditional: expr where matcher holds, else null

Everything compiles to native Catalyst expressions (``F.col``, ``F.lit``,
``F.concat``, ``F.when``, ``F.coalesce``) — no UDFs, so the DSL costs
nothing at 100 TB and filters derived from matchers push down to the scan.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

STR_INTERPOLATION_REGEX = r"\{([^}]+)\}"


def is_matcher(cfg: Any) -> bool:
    """A matcher is a (possibly empty) dict with all-string keys."""
    return isinstance(cfg, dict) and all(isinstance(k, str) for k in cfg)


def compile_matcher(cfg: dict[str, Any]) -> tuple[Column, set[str]]:
    """Matcher dict -> (conjunction Column, referenced column names).

    Empty matcher matches everything (Polars ``all_horizontal`` of nothing
    is true)."""
    if not is_matcher(cfg):
        raise ValueError(
            f"Matcher configuration must be a dictionary with string keys. Got: {cfg}"
        )
    cond = F.lit(True)
    for k, v in cfg.items():
        cond = cond & (F.col(k) == F.lit(v))
    return cond, set(cfg.keys())


def _interpolation_targets(s: str) -> list[str]:
    return re.findall(STR_INTERPOLATION_REGEX, s)


def _compile_str_expr(s: str) -> tuple[Column, set[str]]:
    """f-string interpolation: literal segments + interpolated columns.

    An interpolated expression is null when any referenced column is null
    (reference parser.py str semantics: null columns null out the row's
    value, which downstream code-building then handles)."""
    cols: set[str] = set()
    parts: list[Column] = []
    idx = 0
    for m in re.finditer(STR_INTERPOLATION_REGEX, s):
        if m.start() > idx:
            parts.append(F.lit(s[idx : m.start()]))
        name = m.group(1)
        cols.add(name)
        parts.append(F.col(name).cast("string"))
        idx = m.end()
    if idx < len(s):
        parts.append(F.lit(s[idx:]))
    if not parts:
        return F.lit(""), cols
    # F.concat is null if ANY argument is null — matching the reference's
    # null-propagating interpolation (unlike concat_ws which skips nulls).
    return F.concat(*parts) if len(parts) > 1 else parts[0], cols


def compile_expr(cfg: Any) -> tuple[Column, set[str]]:
    """Compile a column-expression config to (Column, needed columns)."""
    match cfg:
        case {"col": name} if len(cfg) == 1:
            return F.col(name), {name}
        case {"str": s} if len(cfg) == 1:
            return _compile_str_expr(s)
        case {"literal": v} if len(cfg) == 1:
            return F.lit(v), set()
        case str() as s:
            if _interpolation_targets(s):
                return _compile_str_expr(s)
            return F.col(s), {s}
        case list() as items:
            compiled = [compile_expr(x) for x in items]
            cols: set[str] = set()
            for _, c in compiled:
                cols |= c
            return F.coalesce(*[e for e, _ in compiled]), cols
        case {"output": out_cfg, "matcher": matcher_cfg} if len(cfg) == 2:
            out_expr, out_cols = compile_expr(out_cfg)
            cond, cond_cols = compile_matcher(matcher_cfg)
            return F.when(cond, out_expr), out_cols | cond_cols
        case dict() if len(cfg) == 1 and is_matcher(next(iter(cfg.values()))):
            ((expr_str, matcher_cfg),) = cfg.items()
            out_expr, out_cols = compile_expr(expr_str)
            cond, cond_cols = compile_matcher(matcher_cfg)
            return F.when(cond, out_expr), out_cols | cond_cols
        case _:
            raise ValueError(f"Unsupported column expression config: {cfg!r}")


def compile_structured_expr(cfg: Any) -> Column:
    """Convenience wrapper returning just the Column."""
    expr, _ = compile_expr(cfg)
    return expr
