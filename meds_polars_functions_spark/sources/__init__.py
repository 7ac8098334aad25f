from .readers import read_table, resolve_input_path, with_row_index
from .writers import write_parquet, write_json, write_nrt

__all__ = [
    "read_table",
    "resolve_input_path",
    "with_row_index",
    "write_parquet",
    "write_json",
    "write_nrt",
]
