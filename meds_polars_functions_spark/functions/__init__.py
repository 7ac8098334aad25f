from .expr import (
    code_expr,
    coerce_typed_values,
    fill_to_nans,
    keep_first,
    multi_format_time_parse,
    null_safe_join,
    meds_order_window,
    normalize_time_unit,
)
from .parser import compile_expr, compile_matcher, compile_structured_expr
from .skew import count_distinct_twophase, salted_collect_list

__all__ = [
    "code_expr",
    "coerce_typed_values",
    "fill_to_nans",
    "keep_first",
    "multi_format_time_parse",
    "null_safe_join",
    "meds_order_window",
    "normalize_time_unit",
    "compile_expr",
    "compile_matcher",
    "compile_structured_expr",
    "count_distinct_twophase",
    "salted_collect_list",
]
